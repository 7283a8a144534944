"""Activation/gradient statistics debugging.

Functional parity with reference: mridc/utils/debug_hook.py:11-222
(forward/backward hooks logging mean / abs-max of activations and grads).
Flax has no hooks; the equivalents here are (a) `capture_intermediates` stats
over a module apply and (b) gradient pytree stats — both host-side dicts that
callers can log.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["intermediate_stats", "tree_stats"]


def _stats(x) -> Dict[str, float]:
    x = np.asarray(x)
    if x.dtype.kind not in "fc" or x.size == 0:
        return {}
    mag = np.abs(x)
    return {"mean": float(x.mean().real), "abs_max": float(mag.max()), "std": float(x.std())}


def intermediate_stats(model, variables, *args, mutable=("intermediates",), **kwargs) -> Dict[str, Dict[str, float]]:
    """Run ``model.apply`` capturing every submodule output's stats
    (the forward-hook analog). Pass extra collections via ``mutable`` for
    models with their own mutable state (e.g. batch_stats)."""
    mutable = list(dict.fromkeys(list(mutable) + ["intermediates"]))
    _, state = model.apply(variables, *args, capture_intermediates=True, mutable=mutable, **kwargs)
    out: Dict[str, Dict[str, float]] = {}

    def walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}[{i}]")
        else:
            try:
                s = _stats(node)
                if s:
                    out[prefix] = s
            except Exception:
                pass

    walk(state["intermediates"])
    return out


def tree_stats(tree: Any, prefix: str = "") -> Dict[str, Dict[str, float]]:
    """Per-leaf stats of a pytree (the backward-hook analog, applied to grads)."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        name = prefix + "".join(str(p) for p in path)
        s = _stats(leaf)
        if s:
            out[name] = s
    return out
