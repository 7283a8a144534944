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

SEGMENTATION_MODELS = {
    "SEGMENTATIONUNET", "SEGMENTATION2DUNET", "SEGMENTATION3DUNET",
    "SEGMENTATIONATTENTIONUNET", "SEGMENTATIONLAMBDAUNET", "SEGMENTATIONVNET",
    "SEGMENTATIONDYNUNET", "SEGMENTATIONUNETR",
}
MULTITASK_MODELS = {"MTLRS", "JRSCIRIM", "IDSLR", "IDSLRUNET", "SEGNET", "RECSEGNET", "RECSEGUNET", "SERANET"}


def model_task(model_name: str) -> str:
    name = str(model_name).upper()
    if name in SEGMENTATION_MODELS:
        return "segmentation"
    if name in MULTITASK_MODELS:
        return "multitask"
    if name.startswith("Q"):
        return "quantitative"
    return "reconstruction"


def _build_task_loader(task, ds_cfg, model_cfg, shuffle):
    if task == "segmentation":
        from mridc_tpu.data.seg_pipeline import SegBatchLoader, SegmentationDataTransforms
        from mridc_tpu.data.task_loaders import SegmentationMRIDataset

        tfm = SegmentationDataTransforms(
            complex_data=ds_cfg.get("complex_data", True),
            magnitude_input=model_cfg.get("magnitude_input", True),
            input_channels=model_cfg.get("segmentation_module_input_channels", 1),
            output_classes=model_cfg.get("segmentation_module_output_channels"),
            fft_centered=ds_cfg.get("fft_centered", model_cfg.get("fft_centered", False)),
            fft_normalization=ds_cfg.get("fft_normalization", model_cfg.get("fft_normalization", "backward")),
            coil_combination_method=ds_cfg.get("coil_combination_method", "RSS"),
        )
        ds = SegmentationMRIDataset(
            root=ds_cfg["data_path"],
            segmentations_root=ds_cfg.get("segmentations_path"),
            complex_data=ds_cfg.get("complex_data", True),
            sample_rate=ds_cfg.get("sample_rate"),
            consecutive_slices=ds_cfg.get("consecutive_slices", 1),
            transform=tfm,
        )
        from mridc_tpu.data.factory import async_loader

        return async_loader(
            lambda **kw: SegBatchLoader(ds, batch_size=ds_cfg.get("batch_size", 1), shuffle=shuffle, **kw),
            ds_cfg,
        )
    if task == "multitask":
        from mridc_tpu.data.factory import transform_kwargs
        from mridc_tpu.data.seg_pipeline import RSBatchLoader, RSMRIDataTransforms
        from mridc_tpu.data.task_loaders import RSMRIDataset

        # forward EVERY ds_cfg transform knob (crop/zero-fill/ssdu/prewhiten/
        # ...), not just the mask — identical preprocessing to the recon path
        tfm = RSMRIDataTransforms(
            output_classes=model_cfg.get("segmentation_module_output_channels"),
            **transform_kwargs(ds_cfg, model_cfg),
        )
        ds = RSMRIDataset(
            root=ds_cfg["data_path"],
            segmentations_root=ds_cfg.get("segmentations_path"),
            sample_rate=ds_cfg.get("sample_rate"),
            consecutive_slices=ds_cfg.get("consecutive_slices", 1),
            transform=tfm,
        )
        from mridc_tpu.data.factory import async_loader

        return async_loader(
            lambda **kw: RSBatchLoader(ds, batch_size=ds_cfg.get("batch_size", 1), shuffle=shuffle, **kw),
            ds_cfg,
        )
    if task == "quantitative":
        from mridc_tpu.data.seg_pipeline import QBatchLoader
        from mridc_tpu.data.subsample import create_masker
        from mridc_tpu.data.task_loaders import qMRIDataset

        mask_args = ds_cfg.get("mask_args") or {}
        mask_func = None
        if mask_args.get("type"):
            mask_func = create_masker(
                mask_args["type"], mask_args.get("center_fractions", [0.08]), mask_args.get("accelerations", [4])
            )
        ds = qMRIDataset(
            root=ds_cfg["data_path"],
            sample_rate=ds_cfg.get("sample_rate"),
            consecutive_slices=ds_cfg.get("consecutive_slices", 1),
        )
        from mridc_tpu.data.factory import async_loader

        return async_loader(
            lambda **kw: QBatchLoader(
                ds,
                tes=model_cfg.get("TEs", [3.0, 11.5, 20.0, 28.5]),
                mask_func=mask_func,
                batch_size=ds_cfg.get("batch_size", 1),
                shuffle=shuffle,
                fft_centered=model_cfg.get("fft_centered", True),
                fft_normalization=model_cfg.get("fft_normalization", "ortho"),
                compute_target=bool(model_cfg.get("use_reconstruction_module", False)),
                **kw,
            ),
            ds_cfg,
        )
    return build_dataloader(ds_cfg, model_cfg, shuffle=shuffle)


def maybe_init_distributed(trainer_cfg: dict):
    """Multi-host init (reference utils/distributed.py:13-52 NCCL TCP
    rendezvous -> jax.distributed coordinator). Triggered by trainer.num_nodes>1
    or the standard coordinator env vars."""
    import os

    num_nodes = trainer_cfg.get("num_nodes", 1)
    if num_nodes and num_nodes > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            logger.info(
                f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}"
            )
        except Exception as e:  # already initialized or single-process
            logger.warning(f"jax.distributed.initialize skipped: {e}")


_PSF1D_MASK_TYPES = {"random1d", "equispaced1d", "gaussian1d"}
_PSF1D_MODELS = {"CIRIM", "RIM", "MTLRS", "JRSCIRIM", "VN", "E2EVN", "VARNET"}
# VarNet's reduced-state psf1d cascade additionally requires the DC term and
# SENSE combination (models/recon/vn.py from_config raises otherwise)
_PSF1D_VN_NAMES = {"VN", "E2EVN", "VARNET"}


def _auto_dc_mode(model_cfg: dict) -> dict:
    """Enable the exact PSF-1D data-consistency fast path (+56% inference on
    v5e, see docs/performance.md) when the data config guarantees 1D column
    masks: every dataset block generates a 1D mask type, loads no external
    mask files, and applies no partial-Fourier half-scan; SSDU is off (its
    split masks are 2D point subsets). Explicit ``dc_mode`` always wins."""
    name = str(model_cfg.get("model_name", "")).upper()
    if "dc_mode" in model_cfg or name not in _PSF1D_MODELS:
        return model_cfg
    if model_cfg.get("ssdu") or model_cfg.get("n2r"):
        return model_cfg
    if name in _PSF1D_VN_NAMES and (
        model_cfg.get("no_dc")
        or str(model_cfg.get("coil_combination_method", "SENSE")).upper() != "SENSE"
    ):
        return model_cfg
    blocks = [
        model_cfg.get(k)
        for k in ("train_ds", "validation_ds", "test_ds")
        if isinstance(model_cfg.get(k), dict) and model_cfg[k].get("data_path")
    ]
    if not blocks:
        return model_cfg
    for ds in blocks:
        mask_args = ds.get("mask_args") or {}
        if str(mask_args.get("type", "")).lower() not in _PSF1D_MASK_TYPES:
            return model_cfg
        if ds.get("mask_path") or ds.get("half_scan_percentage") or ds.get("ssdu"):
            return model_cfg
    model_cfg = dict(model_cfg)
    model_cfg["dc_mode"] = "psf1d"
    logger.info("1D column masks detected: enabling dc_mode=psf1d (exact DC fast path)")
    return model_cfg


def run_from_config(cfg: dict):
    model_cfg = dict(cfg.get("model") or {})
    trainer_cfg = dict(cfg.get("trainer") or {})
    exp_cfg = dict(cfg.get("exp_manager") or {})
    mode = cfg.get("mode", "train")

    maybe_init_distributed(trainer_cfg)
    model_cfg = _auto_dc_mode(model_cfg)
    model = build_model(model_cfg)

    exp = ExpManager(
        exp_dir=exp_cfg.get("exp_dir", "experiments"),
        name=exp_cfg.get("name", model_cfg.get("model_name", "run")),
        version=exp_cfg.get("version"),
        resume_if_exists=exp_cfg.get("resume_if_exists", False),
        create_tensorboard_logger=exp_cfg.get("create_tensorboard_logger", False),
        checkpoint_monitor=(exp_cfg.get("checkpoint_callback_params") or {}).get("monitor", "val_loss"),
        checkpoint_mode=(exp_cfg.get("checkpoint_callback_params") or {}).get("mode", "min"),
        save_top_k=(exp_cfg.get("checkpoint_callback_params") or {}).get("save_top_k", 3),
        model_config=model_cfg,
    )
    save_config(cfg, exp.log_dir / "config.yaml")

    task = model_task(model_cfg.get("model_name", ""))
    ema_cfg = exp_cfg.get("ema")
    if ema_cfg is True:  # `ema: true` shorthand for `ema: {enable: true}`
        ema_cfg = {"enable": True}
    use_ema = bool(ema_cfg.get("enable", False)) if isinstance(ema_cfg, dict) else False
    task_kwargs = {}
    if task == "segmentation":
        from mridc_tpu.train.task_trainers import SegmentationTrainer, seg_loss_cfg_from_model_cfg

        trainer_cls = SegmentationTrainer
        task_kwargs["seg_loss_cfg"] = seg_loss_cfg_from_model_cfg(model_cfg)
        task_kwargs["segmentation_classes_thresholds"] = model_cfg.get("segmentation_classes_thresholds")
    elif task == "multitask":
        from mridc_tpu.train.task_trainers import MultitaskTrainer, seg_loss_cfg_from_model_cfg

        trainer_cls = MultitaskTrainer
        task_kwargs["segmentation_loss_weight"] = float(model_cfg.get("total_segmentation_loss_weight", 1.0))
        task_kwargs["reconstruction_loss_weight"] = float(model_cfg.get("total_reconstruction_loss_weight", 1.0))
        task_kwargs["seg_loss_cfg"] = seg_loss_cfg_from_model_cfg(model_cfg)
        task_kwargs["segmentation_classes_thresholds"] = model_cfg.get("segmentation_classes_thresholds")
    elif task == "quantitative":
        from mridc_tpu.train.task_trainers import QuantitativeTrainer

        trainer_cls = QuantitativeTrainer
        task_kwargs["loss_regularization_factors"] = model_cfg.get("loss_regularization_factors")
    else:
        trainer_cls = Trainer
    # the unselfsupervised configs use the reference's `loss_fn` /
    # `n2r_loss_regularization_factor` / `reconstruction_loss_regularization_factor`
    # spellings (reference nn/base.py:86-92)
    if "n2r_loss_regularization_factor" in model_cfg:
        trainer_cfg.setdefault("n2r_loss_weight", float(model_cfg["n2r_loss_regularization_factor"]))
    trainer = trainer_cls(
        model,
        **task_kwargs,
        optim_cfg=model_cfg.get("optim"),
        trainer_cfg=trainer_cfg,
        loss_type=model_cfg.get("train_loss_fn", model_cfg.get("loss_fn", "l1")),
        val_loss_type=model_cfg.get("val_loss_fn"),
        use_ema=use_ema,
        loss_regularization_factor=float(model_cfg.get("reconstruction_loss_regularization_factor", 1.0)),
        exp_manager=exp,
        ssdu=bool(model_cfg.get("ssdu", False)),
        kspace_reconstruction_loss=bool(model_cfg.get("kspace_reconstruction_loss", False)),
        log_images=bool(model_cfg.get("log_images", True)),
    )

    # pretrained weights (reference launch.py:129-132: `pretrained: true`
    # loads `checkpoint:` into the model before fit/test). Accepts a .mridc
    # archive path, URL, or registered pretrained name.
    pretrained_params = None
    pretrained_batch_stats = None
    if cfg.get("pretrained"):
        ckpt = cfg.get("checkpoint")
        if ckpt in (None, "", "None", "null"):
            raise ValueError("pretrained: true requires checkpoint: <path | url | registered name>")
        from mridc_tpu.models.pretrained import from_pretrained_variables

        _, pretrained_vars, _ = from_pretrained_variables(str(ckpt))
        pretrained_params = pretrained_vars["params"]
        pretrained_batch_stats = pretrained_vars.get("batch_stats")
        logger.info(f"Loaded pretrained weights from {ckpt}")

    def _install_pretrained(loader):
        first = next(iter(loader))
        if trainer._tx is None:
            trainer.setup_optimization(
                num_samples=len(getattr(loader, "dataset", [])) or 1,
                batch_size=getattr(loader, "batch_size", 1),
            )
        trainer.init_state(jax.random.PRNGKey(0), first)
        import jax.numpy as jnp

        trainer.state = trainer.state.replace(
            params=pretrained_params,
            # a COPY, not an alias: the jitted train step donates the state,
            # and donating the same buffer twice (params is ema_params) is a
            # runtime error
            ema_params=(
                jax.tree_util.tree_map(jnp.array, pretrained_params)
                if trainer.use_ema
                else trainer.state.ema_params
            ),
            # live-BN archives restore their running statistics too
            batch_stats=(
                pretrained_batch_stats
                if pretrained_batch_stats is not None
                else trainer.state.batch_stats
            ),
        )

    if mode == "train":
        train_loader = _build_task_loader(task, model_cfg["train_ds"], model_cfg, True)
        val_loader = (
            _build_task_loader(task, model_cfg["validation_ds"], model_cfg, False)
            if model_cfg.get("validation_ds") and model_cfg["validation_ds"].get("data_path")
            else None
        )
        trainer.setup_optimization(
            num_samples=len(train_loader.dataset), batch_size=train_loader.batch_size
        )
        if pretrained_params is not None:
            _install_pretrained(train_loader)
        if exp_cfg.get("resume_if_exists") and trainer.state is None:
            # restore BEFORE the initial validation / fit — otherwise a
            # preempted run silently restarts from random weights in the
            # same run dir, clobbering its previous top-k checkpoints
            first = next(iter(train_loader))
            trainer.init_state(jax.random.PRNGKey(0), trainer._device_batch(first))
            exp.maybe_resume(trainer)
        if val_loader is not None:
            # reference launch.py:136-138: mode 'train' runs trainer.validate
            # BEFORE fit so the starting point is on record
            if trainer.state is None:
                first = next(iter(val_loader))
                trainer.init_state(jax.random.PRNGKey(0), trainer._device_batch(first))
            from mridc_tpu.train.trainer import _limit_batches

            initial = trainer.validate(
                val_loader, limit=_limit_batches(trainer_cfg.get("limit_val_batches", 1.0), val_loader)
            )
            logger.info(
                "initial validation: "
                + " ".join(f"{k}={v:.5f}" for k, v in initial.items() if isinstance(v, float))
            )
            for k, v in initial.items():
                exp.log_scalar(k, v, int(trainer.state.step))
        history = trainer.fit(train_loader, val_loader, max_epochs=trainer_cfg.get("max_epochs", 1))
        return trainer, history
    # test / eval
    test_loader = _build_task_loader(task, model_cfg["test_ds"], model_cfg, False)
    if trainer.state is None:
        if pretrained_params is not None:
            _install_pretrained(test_loader)
        else:
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
    parser.add_argument(
        "--skip-validation",
        action="store_true",
        help="Skip structured-schema validation of trainer/optim/exp_manager blocks",
    )
    args = parser.parse_args(argv)

    cfg_file = Path(args.config_path) / args.config_name
    if not cfg_file.suffix:
        cfg_file = cfg_file.with_suffix(".yaml")
    cfg = load_config(cfg_file, args.overrides)
    if not args.skip_validation:
        from mridc_tpu.train.schemas import validate_config

        validate_config(cfg)
    run_from_config(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
