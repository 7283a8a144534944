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

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv
from mridc_tpu.utils.typecheck import check_rv

__all__ = [
    "sens_expand",
    "sens_reduce",
    "soft_dc",
    "log_likelihood_gradient",
    "expand_rv_mask",
    "psf1d_gauss_mats",
    "apply_psf1d",
    "log_likelihood_gradient_psf1d",
]


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
    pred_k = fft2_rv(
        cmul(jnp.expand_dims(eta, coil_dim), sens), fft_centered, fft_normalization, spatial_dims
    )
    resid = ifft2_rv(mask * (pred_k - masked_kspace), fft_centered, fft_normalization, spatial_dims)
    grad = cmul_conj(resid, sens).sum(axis=coil_dim) / (sigma**2)
    return jnp.concatenate([eta, grad], axis=-1)


# ---------------------------------------------------------------------------
# PSF-1D data consistency: the TPU fast path for column (1D) undersampling.
#
# fastMRI-style masks vary along the phase-encode axis w only (reference
# subsample.py random/equispaced 1D generators), so the normal-operator chain
#     IFFT2( mask * FFT2(x) )
# collapses exactly: with F2 = F_h (x) F_w and diag(m) acting on k_w alone,
#     F2^{-1} diag(m) F2 = (F_h^{-1} F_h) (x) (F_w^{-1} diag(m) F_w)
#                        = I (x) C_w,
# i.e. ONE per-example [W, W] complex matmul along the readout axis instead of
# a forward + inverse 2D transform (12 Gauss matmuls -> 3, and no mask pass).
# Centered FFTs fold into C_w because the centering shifts cancel pairwise.
# The identity is exact for every normalization mode; the data term
# A^H M y is constant across RIM steps and is precomputed once (``z0``).
# ---------------------------------------------------------------------------


def psf1d_gauss_mats(
    mask_row: jnp.ndarray,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
) -> jnp.ndarray:
    """[B, W] 1D mask rows -> [B, 3, W, W] Gauss-form matrices of the DC
    normal operator ``C = F_w^{-1} diag(m) F_w`` (shifts/norm folded in):
    stacked (Cr, Cr+Ci, Ci-Cr) so each application is 3 real matmuls."""
    from mridc_tpu.ops.fft import dft_mats as _dft_mats

    w = mask_row.shape[-1]
    fr, fi = _dft_mats(w, False, fft_centered, fft_normalization)
    br, bi = _dft_mats(w, True, fft_centered, fft_normalization)
    m = mask_row.astype(jnp.float32)
    # diag(m) @ F scales the rows of F; C = F^{-1} @ (diag(m) F), complex.
    dmr = m[:, :, None] * fr
    dmi = m[:, :, None] * fi
    hp = jax.lax.Precision.HIGHEST
    cr = jnp.einsum("uk,bkv->buv", br, dmr, precision=hp) - jnp.einsum("uk,bkv->buv", bi, dmi, precision=hp)
    ci = jnp.einsum("uk,bkv->buv", br, dmi, precision=hp) + jnp.einsum("uk,bkv->buv", bi, dmr, precision=hp)
    return jnp.stack([cr, cr + ci, ci - cr], axis=1)


def apply_psf1d(x: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Apply the PSF-1D normal operator along the last spatial axis.

    ``x``: [B, ..., W, 2] real view; ``mats``: [B, 3, W, W] from
    :func:`psf1d_gauss_mats`. out[..., u] = sum_v C[u, v] x[..., v] via the
    Gauss 3-multiplication complex product on the MXU.
    """
    from mridc_tpu.ops.fft import _dft_precision

    xr, xi = x[..., 0], x[..., 1]
    c_r, c_sum, c_dif = mats[:, 0], mats[:, 1], mats[:, 2]
    ein = functools.partial(jnp.einsum, precision=_dft_precision())
    k1 = ein("buv,b...v->b...u", c_r, xr + xi)
    k2 = ein("buv,b...v->b...u", c_sum, xi)
    k3 = ein("buv,b...v->b...u", c_dif, xr)
    return jnp.stack([k1 - k2, k1 + k3], axis=-1)


def log_likelihood_gradient_psf1d(
    eta: jnp.ndarray,
    sens: jnp.ndarray,
    mats: jnp.ndarray,
    z0: jnp.ndarray,
    sigma: float = 1.0,
    coil_dim: int = 1,
) -> jnp.ndarray:
    """RIM likelihood gradient via the PSF-1D normal operator:
    ``grad = sum_c s_c^* (C (s_c eta)) - z0`` with
    ``z0 = sens_reduce(mask * y)`` precomputed once per forward.
    Mathematically exact alternative to :func:`log_likelihood_gradient` for
    1D masks (floating-point op order differs, so outputs match to fp noise,
    not bit-for-bit)."""
    coil = cmul(jnp.expand_dims(eta, coil_dim), sens)
    filt = apply_psf1d(coil, mats)
    grad = (cmul_conj(filt, sens).sum(axis=coil_dim) - z0) / (sigma**2)
    return jnp.concatenate([eta, grad], axis=-1)
