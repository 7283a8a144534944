"""Model registry: name -> builder (reference: the if/elif dispatch in
mridc/launch.py:58-127 and mridc/cli/launch.py:81-156, collapsed into a dict).

Accepts both spelling variants the reference entry points use.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

__all__ = ["MODEL_REGISTRY", "register_model", "build_model", "available_models"]

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(*names: str):
    def deco(builder):
        for n in names:
            MODEL_REGISTRY[n.upper()] = builder
        return builder

    return deco


def _register_defaults():
    from mridc_tpu.models import recon

    entries = [
        (("ZF",), recon.ZF),
        (("UNET", "UNet"), recon.UNet),
        (("CASCADENET", "CCNN"), recon.CascadeNet),
        (("CRNNET", "CRNN"), recon.CRNNet),
        (("CIRIM", "RIM"), recon.CIRIM),
        (("VN", "VARNET", "E2EVN"), recon.VarNet),
        (("CS",), recon.CS),
        (("PICS",), recon.PICS),
        (("JOINTICNET",), recon.JointICNet),
        (("PROXIMALGRADIENT", "PG"), recon.ProximalGradient),
        (("RESNET",), recon.ResNet),
        (("RVN", "RECURRENTVARNET"), recon.RecurrentVarNet),
        (("KIKINET",), recon.KIKINet),
        (("LPDNET", "LPD"), recon.LPDNet),
        (("MULTIDOMAINNET", "MULTIDOMAIN"), recon.MultiDomainNet),
        (("XPDNET",), recon.XPDNet),
        (("VSNET",), recon.VSNet),
        (("DUNET",), recon.DUNet),
    ]
    from mridc_tpu.models import quantitative as quant

    entries += [
        (("QCIRIM", "QRIM"), quant.qCIRIM),
        (("QVN", "QVARNET"), quant.qVarNet),
    ]
    from mridc_tpu.models import segmentation as seg

    entries += [
        (("SEGMENTATIONUNET", "SEGMENTATION2DUNET"), seg.SegmentationUNet),
        (("SEGMENTATION3DUNET",), seg.Segmentation3DUNet),
        (("SEGMENTATIONATTENTIONUNET",), seg.SegmentationAttentionUNet),
        (("SEGMENTATIONLAMBDAUNET",), seg.SegmentationLambdaUNet),
        (("SEGMENTATIONVNET",), seg.SegmentationVNet),
        (("SEGMENTATIONDYNUNET",), seg.SegmentationDYNUNet),
        (("SEGMENTATIONUNETR",), seg.SegmentationUNetR),
    ]
    from mridc_tpu.models import multitask as mt

    entries += [
        # JRSCIRIM (reference segmentation/models/jrscirim.py:20, dispatched by
        # launch.py:78) is the v1-named twin of MTLRS: jrscirim_block.py is
        # line-identical to mtlrs_base/mtlrs_block.py modulo the
        # keep_eta->keep_prediction / accumulate_estimates->
        # accumulate_predictions renames, and the top-level model shares the
        # cascade/task-adaption wiring (proven by
        # tests/test_multitask.py::test_jrscirim_is_mtlrs_upstream).
        (("MTLRS", "JRSCIRIM"), mt.MTLRS),
        (("IDSLR",), mt.IDSLR),
        (("IDSLRUNET",), mt.IDSLRUNet),
        (("SEGNET",), mt.SegNet),
        (("RECSEGNET", "RECSEGUNET"), mt.RecSegUNet),
        (("SERANET",), mt.SERANet),
    ]
    for names, cls in entries:
        for n in names:
            # setdefault: a register_model() call made before the lazy default
            # registration must not be clobbered
            MODEL_REGISTRY.setdefault(n.upper(), cls.from_config)


# TPU perf knobs with model-specific support. compute_dtype is NOT listed —
# every learned model honors it. A knob key in the config for a model outside
# its support set is a user error that previously trained/ran silently
# without the knob; fail loudly instead (same convention as compute_dtype's
# history, docs/performance.md knob table).
_TPU_KNOB_SUPPORT = {
    "scan_iterations": {"XPDNET", "KIKINET", "LPDNET", "LPD"},
    "dc_mode": {"CIRIM", "RIM", "MTLRS", "JRSCIRIM", "VN", "E2EVN", "VARNET"},
    "dc_dtype": {"VN", "E2EVN", "VARNET"},
    "remat_mode": {"CIRIM", "RIM", "QCIRIM"},
    "remat_save_dc": {"CIRIM", "RIM"},
    "lane_fold": {"CIRIM", "RIM", "MTLRS", "JRSCIRIM"},
    "train_dc_dtype": {"CIRIM", "RIM", "MTLRS", "JRSCIRIM"},
    "infer_dc_dtype": {"CIRIM", "RIM", "MTLRS", "JRSCIRIM"},
    "train_eta_dtype": {"CIRIM", "RIM"},
    "scan_unroll": {"CIRIM", "RIM"},
    "train_pointwise_matmul": {"CIRIM", "RIM"},
    "stack_intermediates": {"CIRIM", "RIM"},
    # live BatchNorm running statistics (torch momentum semantics) — only
    # meaningful for models whose reference graph carries BatchNorm2d
    # (mwcnn.py:154, conv/conv2d.py:53, vnet_block.py:33,
    # lambda_unet_block.py:70). CRNN shares its conv block across a weight-
    # broadcast scan, where per-iteration stat updates would need a carried
    # collection — unsupported, reject loudly.
    "train_batch_stats": {
        "CASCADENET", "CCNN", "KIKINET", "LPDNET", "LPD", "XPDNET", "VSNET",
        "SEGMENTATIONVNET", "SEGMENTATIONLAMBDAUNET",
        # MTLRS with a BN-bearing segmentation_module (vnet/lambdaunet)
        "MTLRS", "JRSCIRIM",
    },
}


def _check_knob_support(name: str, cfg: Dict[str, Any]) -> None:
    for key, supported in _TPU_KNOB_SUPPORT.items():
        if key in cfg and cfg[key] is not None and name not in supported:
            raise ValueError(
                f"{key!r} is not supported by model {name!r} (supported: "
                f"{sorted(supported)}); remove it from the model config"
            )


_defaults_loaded = False


def _ensure_defaults():
    global _defaults_loaded
    if not _defaults_loaded:
        _register_defaults()
        _defaults_loaded = True


def build_model(cfg: Dict[str, Any]):
    """Build a model module from a config dict with a ``model_name`` key.
    ``use_sens_net: true`` wraps the model with a learned sensitivity estimator."""
    _ensure_defaults()
    name = str(cfg.get("model_name", "")).upper()
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model_name {name!r}. Available: {sorted(MODEL_REGISTRY)}")
    _check_knob_support(name, cfg)
    model = MODEL_REGISTRY[name](cfg)
    from mridc_tpu.models.sens_wrapper import maybe_wrap_sens_net

    return maybe_wrap_sens_net(model, cfg, model_name=name)


def available_models():
    _ensure_defaults()
    return sorted(MODEL_REGISTRY)
