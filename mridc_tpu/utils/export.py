"""Model export to StableHLO with numerical runtime verification.

Functional parity with reference: mridc/core/classes/export.py:43
(``Exportable.export`` — ONNX/TorchScript export + ``verify_runtime`` :125):
here `jax.export` serializes the jitted forward to a portable StableHLO
artifact, and verification round-trips through `jax.export.deserialize` and
compares numerics against the live forward.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Tuple

import jax
import numpy as np

__all__ = ["export_model", "verify_runtime", "load_exported"]


def export_model(fn, example_args: Tuple, path) -> Path:
    """Serialize ``jit(fn)(*example_args)`` to StableHLO bytes at ``path``."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path


def load_exported(path):
    from jax import export as jexport

    return jexport.deserialize(Path(path).read_bytes())


def verify_runtime(fn, example_args: Tuple, path, rtol: float = 1e-4, atol: float = 1e-4) -> bool:
    """Compare the deserialized artifact's outputs against the live forward."""
    exported = load_exported(path)
    got = exported.call(*example_args)
    want = jax.jit(fn)(*example_args)
    got_leaves = jax.tree_util.tree_leaves(got)
    want_leaves = jax.tree_util.tree_leaves(want)
    if len(got_leaves) != len(want_leaves):
        raise AssertionError(
            f"exported artifact returns {len(got_leaves)} output leaves, live forward returns "
            f"{len(want_leaves)} — structure mismatch (stale or corrupt artifact?)"
        )
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=rtol, atol=atol)
    return True
