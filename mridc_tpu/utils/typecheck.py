"""Lightweight runtime shape/dtype contracts.

The reference attaches a semantic-tensor-type lattice to every module
(``mridc/core/neural_types/neural_type.py:1-210`` + the ``typecheck`` decorator,
``core/classes/common.py:718``). On TPU the useful part of that machinery is the
runtime axis contract — names and sizes checked at trace time (shapes are static
under jit, so these checks are free at runtime). This module provides that part:

    check_shape(y, "kspace_rv", ("B", "C", "H", "W", 2))
    check_shape(mask, "mask", ("B", 1, "H", "W"), B=y.shape[0], H=y.shape[2], W=y.shape[3])

String axis names bind on first occurrence and must match on reuse within one
call; integer entries are exact sizes; ``None`` matches anything.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

__all__ = ["check_shape", "check_rv", "ShapeError"]

AxisSpec = Union[str, int, None]


class ShapeError(ValueError):
    """Raised when an array violates its declared axis contract."""


def check_shape(x, name: str, spec: Sequence[AxisSpec], **bound: int) -> Dict[str, int]:
    """Assert ``x.shape`` matches ``spec``; returns the resolved axis bindings.

    ``spec`` entries: int = exact size, str = named axis (consistent within this
    call, seedable via ``**bound``), None = wildcard.
    """
    shape = tuple(getattr(x, "shape", ()))
    if len(shape) != len(spec):
        raise ShapeError(f"{name}: expected rank {len(spec)} {tuple(spec)}, got shape {shape}")
    env: Dict[str, int] = dict(bound)
    for i, (dim, want) in enumerate(zip(shape, spec)):
        if want is None:
            continue
        if isinstance(want, int):
            if dim != want:
                raise ShapeError(f"{name}: axis {i} must be {want}, got {dim} (shape {shape})")
        else:
            if want in env and env[want] != dim:
                raise ShapeError(
                    f"{name}: axis {i} ({want}) must be {env[want]}, got {dim} (shape {shape})"
                )
            env[want] = dim
    return env


def check_rv(x, name: str = "array", coil_axis: Optional[int] = None) -> None:
    """Assert real-view complex layout: float dtype, trailing axis of size 2."""
    shape = tuple(getattr(x, "shape", ()))
    if not shape or shape[-1] != 2:
        raise ShapeError(f"{name}: real-view arrays need a trailing (re, im) axis of 2, got {shape}")
    dtype = getattr(x, "dtype", None)
    if dtype is not None:
        kind = getattr(dtype, "kind", None)
        if kind == "c" or "complex" in str(dtype):
            raise ShapeError(f"{name}: real-view array must be real-dtyped, got {dtype}")
        if kind is not None and kind not in ("f", "V"):
            # "V": ml_dtypes low-precision floats (bfloat16 etc.) report kind V
            raise ShapeError(f"{name}: real-view array must be float-dtyped, got {dtype}")
    if coil_axis is not None and len(shape) <= coil_axis:
        raise ShapeError(f"{name}: expected a coil axis at {coil_axis}, got rank {len(shape)}")
