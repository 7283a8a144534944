"""Complex-number layout adapters and coil-combination primitives.

The reference stores complex data as real-view ``[..., 2]`` tensors with
hand-rolled complex algebra (reference:
mridc/collections/common/parts/utils.py:96-141 ``complex_mul``/``complex_conj``,
:203-262 ``rss``/``rss_complex``/``sense``/``coil_combination``). On TPU we use
native ``complex64``; XLA keeps complex as an SoA pair internally and fuses the
algebra into neighbouring ops, so the hand-rolled forms are unnecessary.

The adapters ``to_real_view`` / ``from_real_view`` exist only at parity-test and
data-ingest boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "to_real_view",
    "from_real_view",
    "complex_abs",
    "complex_abs_sq",
    "rss",
    "rss_complex",
    "sense",
    "coil_combination",
]


def to_real_view(data: jnp.ndarray) -> jnp.ndarray:
    """complex[..., ] -> real[..., 2] (reference layout)."""
    return jnp.stack([data.real, data.imag], axis=-1)


def from_real_view(data: jnp.ndarray) -> jnp.ndarray:
    """real[..., 2] -> complex[...]."""
    if data.shape[-1] != 2:
        raise ValueError(f"Expected trailing complex dim of size 2, got {data.shape}")
    return jax.lax.complex(data[..., 0], data[..., 1])


def complex_abs(data: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(data)


def complex_abs_sq(data: jnp.ndarray) -> jnp.ndarray:
    return data.real**2 + data.imag**2


def rss(data: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
    """Root-sum-of-squares over the coil dimension.

    For complex input this matches the reference's ``rss_complex``
    (reference: common/parts/utils.py:225 sqrt(sum |x|^2)); for real input it
    matches ``rss`` (:207).
    """
    if jnp.iscomplexobj(data):
        return jnp.sqrt(complex_abs_sq(data).sum(axis=dim))
    return jnp.sqrt((data**2).sum(axis=dim))


def rss_complex(data: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
    return jnp.sqrt(complex_abs_sq(data).sum(axis=dim))


def sense(data: jnp.ndarray, sensitivity_maps: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
    """SENSE coil combine: sum_c x_c * conj(S_c)  (reference: utils.py:230-251)."""
    return (data * jnp.conj(sensitivity_maps)).sum(axis=dim)


def coil_combination(
    data: jnp.ndarray,
    sensitivity_maps: jnp.ndarray,
    method: str = "SENSE",
    dim: int = 0,
) -> jnp.ndarray:
    """Dispatch SENSE / RSS coil combination (reference: utils.py:251-273)."""
    method = method.upper()
    if method == "SENSE":
        return sense(data, sensitivity_maps, dim)
    if method == "RSS":
        return rss(data, dim)
    raise ValueError(f"Coil combination method not supported: {method}")


def to_numpy_complex(data) -> np.ndarray:
    """Device array (complex or real-view) -> host complex numpy array."""
    arr = np.asarray(data)
    if not np.iscomplexobj(arr) and arr.shape[-1] == 2:
        arr = arr[..., 0] + 1j * arr[..., 1]
    return arr
