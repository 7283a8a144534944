"""Entry point: ``python -m mridc_tpu.launch --config-path conf --config-name x.yaml [k=v ...]``.

Functional parity with reference: mridc/launch.py:43-145 (hydra main with the
``model:/trainer:/exp_manager:/mode:`` schema and ``mode: train`` ->
validate-then-fit, else test) — re-built on the plain YAML config system.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax

from mridc_tpu.data.factory import build_dataloader
from mridc_tpu.models import build_model
from mridc_tpu.train.config import load_config, save_config
from mridc_tpu.train.exp_manager import ExpManager
from mridc_tpu.train.trainer import Trainer
from mridc_tpu.utils.logging import get_logger

logger = get_logger()


def run_from_config(cfg: dict):
    model_cfg = dict(cfg.get("model") or {})
    trainer_cfg = dict(cfg.get("trainer") or {})
    exp_cfg = dict(cfg.get("exp_manager") or {})
    mode = cfg.get("mode", "train")

    model = build_model(model_cfg)

    exp = ExpManager(
        exp_dir=exp_cfg.get("exp_dir", "experiments"),
        name=exp_cfg.get("name", model_cfg.get("model_name", "run")),
        version=exp_cfg.get("version"),
        resume_if_exists=exp_cfg.get("resume_if_exists", False),
        create_tensorboard_logger=exp_cfg.get("create_tensorboard_logger", False),
        checkpoint_monitor=(exp_cfg.get("checkpoint_callback_params") or {}).get("monitor", "val_loss"),
        save_top_k=(exp_cfg.get("checkpoint_callback_params") or {}).get("save_top_k", 3),
        model_config=model_cfg,
    )
    save_config(cfg, exp.log_dir / "config.yaml")

    trainer = Trainer(
        model,
        optim_cfg=model_cfg.get("optim"),
        trainer_cfg=trainer_cfg,
        loss_type=model_cfg.get("train_loss_fn", "l1"),
        use_ema=bool(exp_cfg.get("ema", {}).get("enable", False)) if isinstance(exp_cfg.get("ema"), dict) else False,
        exp_manager=exp,
    )

    if mode == "train":
        train_loader = build_dataloader(model_cfg["train_ds"], model_cfg, shuffle=True)
        val_loader = (
            build_dataloader(model_cfg["validation_ds"], model_cfg, shuffle=False)
            if model_cfg.get("validation_ds") and model_cfg["validation_ds"].get("data_path")
            else None
        )
        trainer.setup_optimization(
            num_samples=len(train_loader.dataset), batch_size=train_loader.batch_size
        )
        history = trainer.fit(train_loader, val_loader, max_epochs=trainer_cfg.get("max_epochs", 1))
        return trainer, history
    # test / eval
    test_loader = build_dataloader(model_cfg["test_ds"], model_cfg, shuffle=False)
    if trainer.state is None:
        first = next(iter(test_loader))
        trainer.setup_optimization()
        trainer.init_state(jax.random.PRNGKey(0), first)
        exp.maybe_resume(trainer)
    recons, means = trainer.test(test_loader)
    logger.info("Test metrics: " + " ".join(f"{k}={v:.4f}" for k, v in means.items()))
    import h5py
    import numpy as np

    out_dir = exp.log_dir / "reconstructions"
    out_dir.mkdir(parents=True, exist_ok=True)
    for fname, vol in recons.items():
        with h5py.File(out_dir / fname, "w") as hf:
            hf.create_dataset("reconstruction", data=np.asarray(vol))
    return trainer, means


def main(argv=None):
    parser = argparse.ArgumentParser(description="mridc_tpu launcher")
    parser.add_argument("--config-path", default=".", help="Directory containing the config file")
    parser.add_argument("--config-name", required=True, help="YAML config file name")
    parser.add_argument("overrides", nargs="*", help="key=value dotlist overrides")
    args = parser.parse_args(argv)

    cfg_file = Path(args.config_path) / args.config_name
    if not cfg_file.suffix:
        cfg_file = cfg_file.with_suffix(".yaml")
    cfg = load_config(cfg_file, args.overrides)
    run_from_config(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
