"""Experiment manager: run dirs, logging, checkpoint policy, resume, provenance.

Functional parity with reference: mridc/utils/exp_manager.py
(``exp_manager`` :183 — log-dir layout exp_dir/name/version, per-rank log
files, git provenance :347-356, resume :401-471;
``MRIDCModelCheckpoint`` :704 — top-k on monitor + last + end-of-training
archive export).
"""

from __future__ import annotations

import subprocess
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import yaml

from mridc_tpu.train.checkpoints import OrbaxCheckpointer, save_archive
from mridc_tpu.utils.logging import add_file_handler, get_logger, is_global_rank_zero

logger = get_logger()

__all__ = ["ExpManager"]


class ExpManager:
    def __init__(
        self,
        exp_dir: str = "experiments",
        name: str = "default",
        version: Optional[str] = None,
        resume_if_exists: bool = False,
        create_tensorboard_logger: bool = False,
        create_wandb_logger: bool = False,
        wandb_kwargs: Optional[Dict] = None,
        checkpoint_monitor: str = "val_loss",
        checkpoint_mode: str = "min",
        save_top_k: int = 3,
        model_config: Optional[Dict] = None,
    ):
        self.name = name
        if version is None:
            if resume_if_exists:
                version = "run"
            else:
                # all processes must agree on the run directory (orbax saves
                # are collective) — derive the timestamp from process 0
                stamp = time.time()
                import jax

                if jax.process_count() > 1:
                    # NOT wrapped in try/except: if the broadcast fails, each
                    # process would silently fall back to its own clock and
                    # second-boundary skew would yield divergent run dirs —
                    # the collective orbax save then corrupts. Fail loudly.
                    from jax.experimental import multihost_utils

                    stamp = float(
                        multihost_utils.broadcast_one_to_all(np.asarray(stamp, np.float64))
                    )
                version = time.strftime("%Y-%m-%d_%H-%M-%S", time.localtime(stamp))
        self.log_dir = Path(exp_dir) / name / version
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_dir = self.log_dir / "checkpoints"
        self.model_config = model_config or {}
        self.resume_if_exists = resume_if_exists

        if is_global_rank_zero():
            if resume_if_exists:
                self._rotate_previous_logs()
            add_file_handler(self.log_dir)
            self._save_provenance()
            if model_config:
                with open(self.log_dir / "hparams.yaml", "w", encoding="utf-8") as f:
                    yaml.safe_dump(model_config, f, sort_keys=False)

        self.checkpointer = OrbaxCheckpointer(
            self.checkpoint_dir, max_to_keep=save_top_k, monitor=checkpoint_monitor, mode=checkpoint_mode
        )
        self.writer = None
        if create_tensorboard_logger:
            try:
                from flax.metrics import tensorboard

                self.writer = tensorboard.SummaryWriter(str(self.log_dir / "tb"))
            except Exception as e:  # pragma: no cover - depends on tf presence
                logger.warning(f"TensorBoard logger unavailable: {e}")
        self.wandb_run = None
        if create_wandb_logger and is_global_rank_zero():
            # reference exp_manager.py:640-701 wires a WandBLogger; wandb is
            # not shipped in this image so the logger degrades gracefully
            try:
                import wandb

                self.wandb_run = wandb.init(
                    dir=str(self.log_dir), name=f"{name}/{version}", config=self.model_config,
                    **(wandb_kwargs or {}),
                )
            except Exception as e:
                logger.warning(f"WandB logger unavailable: {e}")

    def _save_provenance(self):
        """Git hash + FULL working-tree diff + command line + environment into
        the run dir (reference exp_manager.py:347-356 writes the hash and
        ``git diff``; cmd-args.log mirrors its argv dump)."""
        try:
            sha = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=5
            ).stdout.strip()
            diff = subprocess.run(
                ["git", "diff", "HEAD"], capture_output=True, text=True, timeout=15
            ).stdout
            if sha:
                (self.log_dir / "git-info.log").write_text(
                    f"commit: {sha}\n\n# git diff HEAD\n{diff}"
                )
        except Exception:
            pass
        try:
            import sys

            (self.log_dir / "cmd-args.log").write_text(" ".join(sys.argv) + "\n")
        except Exception:
            pass

    def _rotate_previous_logs(self):
        """Move a previous run's log/event files into run_{N}/ before resuming
        (reference exp_manager.py:401-471 rotates prior logs on resume)."""
        stale = [p for p in self.log_dir.iterdir() if p.is_file() and p.suffix == ".log"]
        stale += [p for p in (self.log_dir / "tb").glob("events.*")] if (self.log_dir / "tb").exists() else []
        if not stale:
            return
        n = 0
        while (self.log_dir / f"run_{n}").exists():
            n += 1
        dest = self.log_dir / f"run_{n}"
        dest.mkdir()
        for p in stale:
            p.rename(dest / p.name)
        logger.info(f"Rotated previous run logs into {dest}")

    def log_scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.scalar(tag, value, step)
        if self.wandb_run is not None:
            self.wandb_run.log({tag: value}, step=step)

    def log_image_triplet(self, tag: str, target, prediction, step: int):
        """target/recon/|error| triplet (reference common/nn/base.py:150-176
        ``log_image``)."""
        if self.writer is None:
            return
        import numpy as np

        t = np.abs(np.asarray(target))
        p = np.abs(np.asarray(prediction))
        t = t / max(t.max(), 1e-12)
        p = p / max(p.max(), 1e-12)
        err = np.abs(t - p)
        panel = np.concatenate([t, p, err], axis=-1)[..., None]
        self.writer.image(tag, panel, step)

    def on_validation_end(self, trainer, metrics: Dict[str, float], step: int):
        self.checkpointer.save(step, trainer.state, metrics)
        for k, v in metrics.items():
            self.log_scalar(k, v, step)

    def on_train_end(self, trainer):
        if trainer.state is not None:
            # the final state is saved as a distinct unmanaged "last"
            # checkpoint so a metric-less save can never perturb the top-k
            # best bookkeeping (reference keeps always_save_last separate
            # from the monitored top-k, exp_manager.py:704)
            self.checkpointer.save_last(trainer.state)
            if is_global_rank_zero():
                # the deployable archive carries the BEST monitored
                # checkpoint, falling back to the final weights (reference
                # re-saves the best model as .mridc on train end,
                # exp_manager.py:824-842)
                params = trainer.state.params
                batch_stats = trainer.state.batch_stats
                try:
                    best = self.checkpointer.restore_best(trainer.state)
                    if best is not None:
                        params = best.params
                        batch_stats = best.batch_stats
                except Exception:
                    pass
                save_archive(
                    self.log_dir / f"{self.name}.mridc", self.model_config, params, batch_stats=batch_stats
                )
        if self.writer is not None:
            self.writer.flush()
        if self.wandb_run is not None:
            self.wandb_run.finish()

    def maybe_resume(self, trainer) -> bool:
        """Restore the newest checkpoint — managed top-k latest or the
        unmanaged "last" (end-of-training/preemption) — into trainer.state
        (reference check_resume :401)."""
        if not self.resume_if_exists or trainer.state is None:
            return False
        candidates = []
        restored = self.checkpointer.restore(trainer.state)
        if restored is not None:
            candidates.append(restored)
        last = self.checkpointer.restore_last(trainer.state)
        if last is not None:
            candidates.append(last)
        if not candidates:
            return False
        trainer.state = max(candidates, key=lambda s: int(s.step))
        logger.info(f"Resumed from step {int(trainer.state.step)}")
        return True
