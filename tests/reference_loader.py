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
