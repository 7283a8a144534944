"""Checkpointing: orbax step checkpoints + the portable `.mridc`-style archive.

Functional parity with reference:
mridc/core/connectors/save_restore_connector.py:24 (``.mridc`` tar.gz =
``model_config.yaml`` + ``model_weights.ckpt``) and
mridc/utils/exp_manager.py:704 ``MRIDCModelCheckpoint`` (top-k on monitor,
``-last`` checkpoint, best re-saved as archive on train end).

The archive here is ``model_config.yaml`` + ``model_weights.msgpack``
(flax.serialization) in a tar.gz with the same restore flow: read config,
rebuild model from the registry, load weights.
"""

from __future__ import annotations

import io
import tarfile
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import yaml
from flax import serialization

__all__ = ["save_archive", "load_archive", "restore_model", "restore_model_variables", "OrbaxCheckpointer"]

_CONFIG_NAME = "model_config.yaml"
_WEIGHTS_NAME = "model_weights.msgpack"


def save_archive(path, cfg: Dict, params, batch_stats=None) -> Path:
    """Write a portable model archive (config + weights). When the model
    carries live BatchNorm running stats (``train_batch_stats``), they are
    stored alongside params under a ``batch_stats`` sibling tree."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    if batch_stats is not None:
        params = {"params": params, "batch_stats": jax.device_get(batch_stats)}
    weights = serialization.to_bytes(params)
    cfg_bytes = yaml.safe_dump(cfg, sort_keys=False).encode()
    with tarfile.open(path, "w:gz") as tar:
        for name, data in ((_CONFIG_NAME, cfg_bytes), (_WEIGHTS_NAME, weights)):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return path


def load_archive(path) -> Tuple[Dict, bytes]:
    """Read (config, raw weight bytes) from an archive."""
    with tarfile.open(path, "r:gz") as tar:
        cfg = yaml.safe_load(tar.extractfile(_CONFIG_NAME).read())
        weights = tar.extractfile(_WEIGHTS_NAME).read()
    return cfg, weights


def _is_reference_torch_archive(path) -> bool:
    """True for a reference-format ``.mridc`` tar: ``model_config.yaml`` +
    ``model_weights.ckpt`` (torch pickle) instead of our msgpack weights
    (reference mridc/core/connectors/save_restore_connector.py:32-56)."""
    try:
        with tarfile.open(path, "r:*") as tar:
            names = [n.lstrip("./") for n in tar.getnames()]
    except tarfile.ReadError:
        return False
    return any(n.endswith("model_weights.ckpt") for n in names)


def _restore_reference_archive(path, override_config: Optional[Dict] = None):
    """Restore a reference (PyTorch) ``.mridc`` archive: read its
    model_config.yaml, rebuild the model from our registry (the config keys
    are compatible by design), and convert the torch state dict into our flax
    param tree (utils/torch_import.py). This is the cross-framework
    ``from_pretrained`` path — a user's trained reference checkpoint loads
    directly (reference mridc/core/classes/common.py:634)."""
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_reference_model_params, load_torch_state_dict

    with tarfile.open(path, "r:*") as tar:
        member = next(
            (m for m in tar.getmembers() if m.name.lstrip("./").endswith(_CONFIG_NAME)), None
        )
        if member is None:
            raise ValueError(
                f"reference archive {path} has model weights but no {_CONFIG_NAME} member"
            )
        cfg = yaml.safe_load(tar.extractfile(member).read())
    if isinstance(cfg, dict) and "model" in cfg and "model_name" not in cfg:
        cfg = dict(cfg["model"])  # archives saved with the full cfg tree
    if override_config:
        cfg = {**cfg, **override_config}
    model = build_model(cfg)
    params = import_reference_model_params(cfg, load_torch_state_dict(path))
    return model, {"params": params}, cfg


def restore_model_variables(path, override_config: Optional[Dict] = None):
    """Rebuild ``(model, variables, cfg)`` from an archive, where variables is
    ``{"params": ...}`` plus ``"batch_stats"`` for live-BN archives
    (train_batch_stats models save both collections). Reference torch
    archives (``model_weights.ckpt``) are converted on the fly."""
    from mridc_tpu.models import build_model

    if _is_reference_torch_archive(path):
        return _restore_reference_archive(path, override_config)
    cfg, weights = load_archive(path)
    if override_config:
        cfg = {**cfg, **override_config}
    model = build_model(cfg)
    tree = serialization.msgpack_restore(weights)
    if not (isinstance(tree, dict) and set(tree) == {"params", "batch_stats"}):
        tree = {"params": tree}
    return model, tree, cfg


def restore_model(path, override_config: Optional[Dict] = None):
    """Rebuild (model, params, cfg) from an archive — the ``restore_from``
    path (reference save_restore_connector.py:173). Live-BN archives are
    unwrapped to the bare param tree; use :func:`restore_model_variables`
    when the running statistics are needed too."""
    model, variables, cfg = restore_model_variables(path, override_config)
    return model, variables["params"], cfg


class OrbaxCheckpointer:
    """Thin orbax wrapper: save/restore train state by step, keep top-k."""

    def __init__(self, directory, max_to_keep: int = 3, monitor: str = "val_loss", mode: str = "min"):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        # a checkpoint whose metrics miss the monitor must rank WORST in
        # either mode (with +inf it would rank BEST under mode='max' and
        # evict genuinely-ranked checkpoints)
        missing = -np.inf if mode == "max" else np.inf
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get(monitor, missing),
            best_mode=mode,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, metrics: Optional[Dict[str, float]] = None):
        import orbax.checkpoint as ocp

        state = jax.device_get(state)
        self._mgr.save(
            int(step),
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def restore(self, state_template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        target = jax.device_get(state_template)
        return self._mgr.restore(int(step), args=ocp.args.StandardRestore(target))

    def save_last(self, state):
        """Unmanaged "last" checkpoint, outside the top-k metric bookkeeping
        (used for end-of-training and preemption saves, where no monitored
        metric exists — a metric-less managed save would rank as worst-best
        and could perturb the top-k set)."""
        import shutil

        import orbax.checkpoint as ocp

        state = jax.device_get(state)
        path = self.directory / "last"
        # multi-process: only process 0 clears the shared path, and everyone
        # synchronizes before the collective save — an unconditional rmtree on
        # every process could delete files the primary is already writing
        if jax.process_index() == 0 and path.exists():
            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("mridc_save_last_rm")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()

    def restore_last(self, state_template):
        import orbax.checkpoint as ocp

        path = self.directory / "last"
        if not path.exists():
            return None
        target = jax.device_get(state_template)
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=target)

    def restore_best(self, state_template):
        """Restore the best monitored checkpoint (None if nothing ranked)."""
        step = self._mgr.best_step()
        if step is None:
            return None
        return self.restore(state_template, step=step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def close(self):
        self._mgr.close()
