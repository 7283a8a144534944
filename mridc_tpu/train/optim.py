"""Optimizer registry over optax.

Functional parity with reference: mridc/core/optim/optimizers.py
(``AVAILABLE_OPTIMIZERS`` :22 — sgd, adam, adamw, adadelta, adamax, adagrad,
rmsprop, rprop, novograd, adafactor; plus radam from core/optim/radam.py).
torch-style hyperparameter names (betas, eps, weight_decay, momentum) are
translated to the optax equivalents.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Union

import optax

__all__ = ["AVAILABLE_OPTIMIZERS", "get_optimizer", "parse_optimizer_args"]

ScalarOrSchedule = Union[float, Callable]


def _betas(kwargs, default=(0.9, 0.999)):
    b1, b2 = kwargs.pop("betas", default)
    return b1, b2


def _l2(kw, tx):
    """torch-style L2 weight decay: wd * param added to the gradient before
    the optimizer transform (torch.optim's weight_decay semantics; previously
    the key was silently dropped for these optimizers)."""
    wd = kw.get("weight_decay", 0.0) or 0.0
    if not wd:
        return tx
    return optax.chain(optax.add_decayed_weights(wd), tx)


def _sgd(lr, **kw):
    return _l2(kw, optax.sgd(lr, momentum=kw.get("momentum") or None, nesterov=kw.get("nesterov", False)))


def _adam(lr, **kw):
    b1, b2 = _betas(kw)
    return _l2(kw, optax.adam(lr, b1=b1, b2=b2, eps=kw.get("eps", 1e-8)))


def _adamw(lr, **kw):
    b1, b2 = _betas(kw)
    return optax.adamw(lr, b1=b1, b2=b2, eps=kw.get("eps", 1e-8), weight_decay=kw.get("weight_decay", 1e-2))


def _adadelta(lr, **kw):
    return _l2(kw, optax.adadelta(lr, rho=kw.get("rho", 0.9), eps=kw.get("eps", 1e-6)))


def _adamax(lr, **kw):
    b1, b2 = _betas(kw)
    return _l2(kw, optax.adamax(lr, b1=b1, b2=b2, eps=kw.get("eps", 1e-8)))


def _adagrad(lr, **kw):
    return _l2(kw, optax.adagrad(lr, eps=kw.get("eps", 1e-10)))


def _rmsprop(lr, **kw):
    return _l2(
        kw,
        optax.rmsprop(lr, decay=kw.get("alpha", 0.99), eps=kw.get("eps", 1e-8), momentum=kw.get("momentum") or None),
    )


def _rprop(lr, **kw):
    etas = kw.get("etas", (0.5, 1.2))
    return optax.rprop(lr, eta_minus=etas[0], eta_plus=etas[1])


def _novograd(lr, **kw):
    b1, b2 = _betas(kw, (0.95, 0.98))
    return optax.novograd(lr, b1=b1, b2=b2, eps=kw.get("eps", 1e-8), weight_decay=kw.get("weight_decay", 0.0))


def _adafactor(lr, **kw):
    return optax.adafactor(lr, weight_decay_rate=kw.get("weight_decay") or None)


def _radam(lr, **kw):
    b1, b2 = _betas(kw)
    return _l2(kw, optax.radam(lr, b1=b1, b2=b2, eps=kw.get("eps", 1e-8)))


def _lamb(lr, **kw):
    b1, b2 = _betas(kw)
    return optax.lamb(lr, b1=b1, b2=b2, eps=kw.get("eps", 1e-6), weight_decay=kw.get("weight_decay", 0.0))


AVAILABLE_OPTIMIZERS: Dict[str, Callable] = {
    "sgd": _sgd,
    "adam": _adam,
    "adamw": _adamw,
    "adadelta": _adadelta,
    "adamax": _adamax,
    "adagrad": _adagrad,
    "rmsprop": _rmsprop,
    "rprop": _rprop,
    "novograd": _novograd,
    "adafactor": _adafactor,
    "radam": _radam,
    "lamb": _lamb,
}


def parse_optimizer_args(optim_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Strip framework keys, keep optimizer hyperparameters (reference :38-135)."""
    kwargs = dict(optim_cfg or {})
    for k in ("name", "lr", "sched"):
        kwargs.pop(k, None)
    return kwargs


def get_optimizer(name: str, lr: ScalarOrSchedule, **kwargs) -> optax.GradientTransformation:
    name = str(name).lower()
    if name not in AVAILABLE_OPTIMIZERS:
        raise ValueError(f"Unknown optimizer {name!r}. Available: {sorted(AVAILABLE_OPTIMIZERS)}")
    return AVAILABLE_OPTIMIZERS[name](lr, **kwargs)
