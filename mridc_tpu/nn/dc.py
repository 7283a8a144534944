"""Data-consistency primitives shared by the unrolled reconstruction models.

Functional parity with reference:
mridc/collections/reconstruction/nn/varnet/vn_block.py (``sens_expand`` :53,
``sens_reduce`` :77, soft DC :125-135) and
mridc/collections/reconstruction/nn/rim/rim_utils.py:11
(``log_likelihood_gradient``).

Device layout: real views ``[..., 2]`` (see :mod:`mridc_tpu.ops.cplx`) — the
axon TPU backend executes no complex64 ops. Each DC evaluation is 2 real-view
FFTs (MXU DFT matmuls on TPU) + 2 complex muls + a coil reduction; XLA fuses
the elementwise algebra into the matmuls' epilogues.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv
from mridc_tpu.utils.typecheck import check_rv

__all__ = ["sens_expand", "sens_reduce", "soft_dc", "log_likelihood_gradient", "expand_rv_mask"]


def expand_rv_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, 1, H, W] (or broadcastable) float mask -> [..., 1] for rv arrays."""
    return mask[..., None]


def sens_expand(
    image: jnp.ndarray,
    sens: jnp.ndarray,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
) -> jnp.ndarray:
    """Coil-combined image [B, H, W, 2] -> multicoil k-space [B, C, H, W, 2]."""
    check_rv(image, "sens_expand.image")
    check_rv(sens, "sens_expand.sens")
    if image.ndim == sens.ndim - 1:
        image = image[:, None]
    return fft2_rv(cmul(image, sens), fft_centered, fft_normalization, spatial_dims)


def sens_reduce(
    kspace: jnp.ndarray,
    sens: jnp.ndarray,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
    coil_dim: int = 1,
    keepdims: bool = False,
) -> jnp.ndarray:
    """Multicoil k-space [B, C, H, W, 2] -> SENSE-combined image [B, H, W, 2]."""
    check_rv(kspace, "sens_reduce.kspace")
    img = ifft2_rv(kspace, fft_centered, fft_normalization, spatial_dims)
    return cmul_conj(img, sens).sum(axis=coil_dim, keepdims=keepdims)


def soft_dc(pred_kspace: jnp.ndarray, ref_kspace: jnp.ndarray, mask: jnp.ndarray, weight) -> jnp.ndarray:
    """Soft data-consistency ``where(mask, pred - ref, 0) * w`` on rv arrays."""
    if mask.ndim == pred_kspace.ndim - 1:
        mask = mask[..., None]
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
    """RIM likelihood gradient as [B, H, W, 4] channels
    ``[re(eta), im(eta), re(grad), im(grad)]`` (reference rim_utils.py:11-85)."""
    if mask.ndim == masked_kspace.ndim - 1:
        mask = mask[..., None]
    pred_k = fft2_rv(cmul(eta[:, None], sens), fft_centered, fft_normalization, spatial_dims)
    resid = ifft2_rv(mask * (pred_k - masked_kspace), fft_centered, fft_normalization, spatial_dims)
    grad = cmul_conj(resid, sens).sum(axis=coil_dim) / (sigma**2)
    return jnp.concatenate([eta, grad], axis=-1)
