"""Data-consistency primitives shared by the unrolled reconstruction models.

Functional parity with reference:
mridc/collections/reconstruction/nn/varnet/vn_block.py (``sens_expand`` :53,
``sens_reduce`` :77, soft DC :125-135) and
mridc/collections/reconstruction/nn/rim/rim_utils.py:11
(``log_likelihood_gradient``).

These are the hot ops of every unrolled model: each evaluation is
2 FFTs + 2 complex muls + a coil reduction. On TPU the FFT lowers to the XLA
TPU FFT and XLA fuses the elementwise complex algebra into its neighbours;
a fused Pallas variant lives in :mod:`mridc_tpu.ops.kernels` for the cases
where manual fusion beats XLA.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from mridc_tpu.ops.fft import fft2, ifft2

__all__ = ["sens_expand", "sens_reduce", "soft_dc", "log_likelihood_gradient"]


def sens_expand(
    image: jnp.ndarray,
    sens: jnp.ndarray,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
) -> jnp.ndarray:
    """Coil-combined image [B, H, W] -> multicoil k-space [B, C, H, W]."""
    if image.ndim == sens.ndim - 1:
        image = image[:, None]
    return fft2(image * sens, fft_centered, fft_normalization, spatial_dims)


def sens_reduce(
    kspace: jnp.ndarray,
    sens: jnp.ndarray,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
    coil_dim: int = 1,
    keepdims: bool = False,
) -> jnp.ndarray:
    """Multicoil k-space [B, C, H, W] -> SENSE-combined image [B, H, W]."""
    img = ifft2(kspace, fft_centered, fft_normalization, spatial_dims)
    return (img * jnp.conj(sens)).sum(axis=coil_dim, keepdims=keepdims)


def soft_dc(pred_kspace: jnp.ndarray, ref_kspace: jnp.ndarray, mask: jnp.ndarray, weight) -> jnp.ndarray:
    """Soft data-consistency term ``where(mask, pred - ref, 0) * w``."""
    return jnp.where(mask.astype(bool), pred_kspace - ref_kspace, jnp.zeros((), pred_kspace.dtype)) * weight


def log_likelihood_gradient(
    eta: jnp.ndarray,
    masked_kspace: jnp.ndarray,
    sens: jnp.ndarray,
    mask: jnp.ndarray,
    sigma: float = 1.0,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
    coil_dim: int = 1,
) -> jnp.ndarray:
    """RIM likelihood gradient, returned as [B, H, W, 4] channels
    ``[re(eta), im(eta), re(grad), im(grad)]`` (reference rim_utils.py:11-85).
    """
    coil_imgs = eta[:, None] * sens
    pred_k = fft2(coil_imgs, fft_centered, fft_normalization, spatial_dims)
    resid = ifft2(mask * (pred_k - masked_kspace), fft_centered, fft_normalization, spatial_dims)
    grad = (resid * jnp.conj(sens)).sum(axis=coil_dim) / (sigma**2)
    return jnp.stack([eta.real, eta.imag, grad.real, grad.imag], axis=-1)
