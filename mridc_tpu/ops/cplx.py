"""Real-view complex algebra: complex tensors as float arrays with a trailing
``[..., 2]`` (re, im) axis.

This is the **device-side** complex representation. The axon TPU backend does
not execute complex64 ops (any executable containing complex dtypes fails
UNIMPLEMENTED), so everything that runs under jit uses this layout — which is
also the reference's tensor layout (reference:
mridc/collections/common/parts/utils.py:96-141 ``complex_mul``/``complex_conj``
over ``[..., 2]`` real views), making weight/activation parity direct.

Host-side (numpy) code keeps native complex; the conversions live at the
batcher boundary.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "cplx",
    "re",
    "im",
    "cmul",
    "cmul_conj",
    "cconj",
    "cabs",
    "cabs2",
    "crss",
    "csense",
    "ccombine",
    "to_rv",
    "from_rv",
]


def cplx(real: jnp.ndarray, imag: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([real, imag], axis=-1)


def re(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0]


def im(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 1]


def cmul(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(a+bi)(c+di) on [..., 2] views."""
    a, b = x[..., 0], x[..., 1]
    c, d = y[..., 0], y[..., 1]
    return jnp.stack([a * c - b * d, a * d + b * c], axis=-1)


def cmul_conj(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x * conj(y) without materializing conj."""
    a, b = x[..., 0], x[..., 1]
    c, d = y[..., 0], y[..., 1]
    return jnp.stack([a * c + b * d, b * c - a * d], axis=-1)


def cconj(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([x[..., 0], -x[..., 1]], axis=-1)


def cabs2(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0] ** 2 + x[..., 1] ** 2


def cabs(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(cabs2(x))


def crss(x: jnp.ndarray, dim: int = 1) -> jnp.ndarray:
    """Root-sum-of-squares over the coil axis -> magnitude [...] (no complex axis)."""
    return jnp.sqrt(cabs2(x).sum(axis=dim))


def csense(x: jnp.ndarray, sens: jnp.ndarray, dim: int = 1) -> jnp.ndarray:
    """SENSE combine sum_c x_c conj(S_c) -> [..., 2]."""
    return cmul_conj(x, sens).sum(axis=dim)


def ccombine(x: jnp.ndarray, sens: jnp.ndarray, method: str = "SENSE", dim: int = 1) -> jnp.ndarray:
    """Coil combination on real views. RSS returns a zero-imag [..., 2] view so
    downstream shapes stay uniform."""
    method = method.upper()
    if method == "SENSE":
        return csense(x, sens, dim)
    if method == "RSS":
        mag = crss(x, dim)
        return jnp.stack([mag, jnp.zeros_like(mag)], axis=-1)
    raise ValueError(f"Coil combination method not supported: {method}")


def to_rv(x: np.ndarray) -> np.ndarray:
    """host complex -> [..., 2] float32 real view."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    return np.stack([x, np.zeros_like(x)], axis=-1).astype(np.float32)


def from_rv(x) -> np.ndarray:
    """[..., 2] float real view -> host complex64."""
    x = np.asarray(x)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)
