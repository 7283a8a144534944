"""Load leaf modules of the READ-ONLY reference package (/root/reference)
without executing its package __init__ chain (which requires
pytorch_lightning/hydra/omegaconf, absent here).

Parent packages are registered as empty ModuleType objects whose __path__
points at the real directories, so only the requested leaf files execute.
Used exclusively by golden-parity tests that compare our TPU models against
the reference's actual torch graphs; never imported by mridc_tpu itself.
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")

_PKGS = [
    "mridc",
    "mridc.collections",
    "mridc.collections.common",
    "mridc.collections.common.parts",
    "mridc.collections.reconstruction",
    "mridc.collections.reconstruction.data",
    "mridc.collections.reconstruction.nn",
    "mridc.collections.reconstruction.nn.rim",
    "mridc.collections.reconstruction.nn.unet_base",
    "mridc.collections.reconstruction.nn.varnet",
    "mridc.collections.reconstruction.nn.recurrentvarnet",
    "mridc.collections.reconstruction.nn.cascadenet",
    "mridc.collections.reconstruction.nn.convrecnet",
    "mridc.collections.reconstruction.nn.conv",
    "mridc.collections.common.losses",
    "mridc.core",
    "mridc.core.classes",
    "mridc.collections.quantitative",
    "mridc.collections.quantitative.nn",
    "mridc.collections.quantitative.nn.qrim",
    "mridc.collections.quantitative.parts",
    "mridc.collections.common.data",
    "mridc.collections.reconstruction.losses",
    "mridc.collections.reconstruction.metrics",
    "mridc.collections.reconstruction.parts",
    "mridc.collections.segmentation",
    "mridc.collections.segmentation.nn",
    "mridc.collections.segmentation.nn.attention_unet_base",
    "mridc.collections.segmentation.nn.vnet_base",
    "mridc.collections.segmentation.nn.dynunet_base",
    "mridc.collections.segmentation.nn.unetr_base",
    "mridc.collections.segmentation.nn.vit_base",
    "mridc.collections.segmentation.nn.lambda_unet_base",
    "mridc.collections.multitask",
    "mridc.collections.multitask.rs",
    "mridc.collections.multitask.rs.nn",
    "mridc.collections.multitask.rs.nn.mtlrs_base",
    "mridc.collections.multitask.rs.nn.seranet_base",
    "mridc.collections.multitask.rs.nn.idslr_base",
    "mridc.collections.multitask.rs.nn.segnet_base",
    "mridc.collections.multitask.rs.nn.recseg_base",
    "mridc.collections.reconstruction.nn.crossdomain",
    "mridc.collections.reconstruction.nn.didn",
    "mridc.collections.reconstruction.nn.mwcnn",
    "mridc.collections.reconstruction.nn.multidomain",
    "mridc.collections.reconstruction.nn.primaldual",
    "mridc.collections.reconstruction.nn.resnet_base",
    "mridc.collections.reconstruction.nn.sigmanet_base",
    "mridc.collections.reconstruction.nn.variablesplittingnet_base",
]


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name) or types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


def install():
    """Register fake parent packages + third-party stubs. Idempotent."""
    if "mridc" in sys.modules and getattr(sys.modules["mridc"], "__graft_fake__", False):
        return
    # third-party shims for import-time symbols only
    class ListConfig(list):
        pass

    class _OmegaConf:
        @staticmethod
        def to_container(x, resolve=True):
            return x

    omegaconf = _stub("omegaconf", ListConfig=ListConfig)
    omegaconf.DictConfig = dict
    omegaconf.OmegaConf = _OmegaConf

    def _identity_decorator(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda fn: fn

    _stub("numba", jit=_identity_decorator, njit=_identity_decorator)

    # Heavier third-party shims so module-level `from X import Y` in reference
    # leaf files succeeds; only symbols touched at import time matter.
    class _AnyClass:
        def __init__(self, *a, **k):
            pass

    _stub("pytorch_lightning", Trainer=_AnyClass, LightningModule=_AnyClass, Callback=_AnyClass)
    _stub("pytorch_lightning.callbacks", Callback=_AnyClass)
    _stub("runstats", Statistics=_AnyClass)
    skimage = _stub("skimage")
    skimage.metrics = _stub(
        "skimage.metrics",
        peak_signal_noise_ratio=lambda *a, **k: 0.0,
        structural_similarity=lambda *a, **k: 0.0,
    )
    import xml.etree.ElementTree as _ET

    defusedxml = _stub("defusedxml")
    defusedxml.ElementTree = _stub("defusedxml.ElementTree", fromstring=_ET.fromstring)

    # The real common/nn/base.py subclasses ModelPT/LightningModule (PTL) — for
    # golden tests of loss/step arithmetic only the three names must exist.
    _stub(
        "mridc.collections.common.nn.base",
        BaseMRIModel=_AnyClass,
        BaseSensitivityModel=_AnyClass,
        DistributedMetricSum=_AnyClass,
        __graft_fake__=True,
    )
    _stub("mridc.collections.common.nn", base=sys.modules["mridc.collections.common.nn.base"], __graft_fake__=True)

    # mridc.core.classes.common pulls hydra/wrapt/connectors; model files only
    # use its `typecheck` decorator at import time.
    _stub(
        "mridc.core.classes.common",
        typecheck=_identity_decorator,
        Typing=_AnyClass,
        Serialization=_AnyClass,
        FileIO=_AnyClass,
        Model=_AnyClass,
        __graft_fake__=True,
    )

    for pkg in _PKGS:
        rel = pkg.replace(".", "/")
        mod = types.ModuleType(pkg)
        mod.__graft_fake__ = True
        mod.__path__ = [str(REFERENCE_ROOT / rel)]
        sys.modules[pkg] = mod


def load(leaf: str):
    """Import e.g. 'mridc.collections.reconstruction.nn.rim.rim_block'."""
    install()
    return importlib.import_module(leaf)


def load_file(relpath: str, name: str):
    """Execute a reference file under an alternate module name — for files
    whose canonical module path is occupied by a stub (e.g. common/nn/base.py,
    stubbed so model files can import its class names without PTL). Extra
    third-party shims (wandb, torchmetrics, modelPT, model_utils) are
    installed here so the real file's import block succeeds."""
    install()

    class _AnyClass:
        def __init__(self, *a, **k):
            pass

    _stub("wandb", require=lambda *a, **k: None, login=lambda *a, **k: None)
    tm = _stub("torchmetrics")
    tm.metric = _stub("torchmetrics.metric", Metric=_AnyClass)
    _stub("mridc.core.classes.modelPT", ModelPT=_AnyClass, __graft_fake__=True)
    _stub("mridc.utils", model_utils=_stub("mridc.utils.model_utils", __graft_fake__=True), __graft_fake__=True)
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, str(REFERENCE_ROOT / relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
