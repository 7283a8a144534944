"""Centered / uncentered 2D FFT primitives on native complex arrays.

Functional parity with the reference's real-view FFT wrappers
(reference: mridc/collections/common/parts/fft.py:13-91 ``fft2``/``ifft2``,
:243-324 ``fftshift``/``ifftshift``), but TPU-native: arrays are complex64 and
the transform lowers straight to the XLA TPU FFT — no view_as_complex round
trips, no python-side rolls (``jnp.fft.fftshift`` is a static-shape gather XLA
folds into the FFT's index computation).

Normalization modes mirror ``torch.fft.fft2``'s ``norm=`` argument:
"backward" (default, no scaling on forward), "ortho" (1/sqrt(n) both ways),
"forward" (1/n on forward). "none"/None is accepted as an alias of "backward".
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

__all__ = ["fft2c", "ifft2c", "fft2", "ifft2", "fftshift", "ifftshift", "fft2_rv", "ifft2_rv", "dft_mats"]


def _norm(normalization: Optional[str]) -> Optional[str]:
    if normalization is None:
        return "backward"
    normalization = normalization.lower()
    if normalization == "none":
        return "backward"
    if normalization not in ("backward", "ortho", "forward"):
        raise ValueError(f"Unknown FFT normalization: {normalization!r}")
    return normalization


def _dims(spatial_dims: Optional[Sequence[int]]) -> Tuple[int, ...]:
    if spatial_dims is None:
        return (-2, -1)
    return tuple(int(d) for d in spatial_dims)


def fft2(
    data: jnp.ndarray,
    centered: bool = False,
    normalization: str = "backward",
    spatial_dims: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """2D FFT of a complex array over ``spatial_dims`` (default last two).

    ``centered=True`` surrounds the transform with ifftshift/fftshift so that
    the zero-frequency component sits at the center of the spectrum, matching
    the reference's ``fft2(..., centered=True)``.
    """
    dims = _dims(spatial_dims)
    if centered:
        data = jnp.fft.ifftshift(data, axes=dims)
    data = jnp.fft.fftn(data, axes=dims, norm=_norm(normalization))
    if centered:
        data = jnp.fft.fftshift(data, axes=dims)
    return data


def ifft2(
    data: jnp.ndarray,
    centered: bool = False,
    normalization: str = "backward",
    spatial_dims: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """2D inverse FFT; exact inverse of :func:`fft2` for the same arguments."""
    dims = _dims(spatial_dims)
    if centered:
        data = jnp.fft.ifftshift(data, axes=dims)
    data = jnp.fft.ifftn(data, axes=dims, norm=_norm(normalization))
    if centered:
        data = jnp.fft.fftshift(data, axes=dims)
    return data


# Aliases emphasizing the centered/orthonormal convention used by fastMRI-style
# pipelines; plain names above keep reference-config compatibility.
def fft2c(data: jnp.ndarray, spatial_dims: Optional[Sequence[int]] = None) -> jnp.ndarray:
    return fft2(data, centered=True, normalization="ortho", spatial_dims=spatial_dims)


def ifft2c(data: jnp.ndarray, spatial_dims: Optional[Sequence[int]] = None) -> jnp.ndarray:
    return ifft2(data, centered=True, normalization="ortho", spatial_dims=spatial_dims)


def fftshift(data: jnp.ndarray, axes=None) -> jnp.ndarray:
    return jnp.fft.fftshift(data, axes=axes)


def ifftshift(data: jnp.ndarray, axes=None) -> jnp.ndarray:
    return jnp.fft.ifftshift(data, axes=axes)


# ---------------------------------------------------------------------------
# Real-view FFT: the device-side path.
#
# The axon TPU backend cannot execute complex64 ops, so jitted code carries
# complex data as [..., h, w, 2] float real views (see mridc_tpu.ops.cplx) and
# the 2D transform is computed as DFT *matmuls* on the MXU with precomputed
# matrices that fold in the centering shifts and normalization:
#   M = fftshift . F . ifftshift      (one constant [n, n] matrix per axis)
#   Y = M_h @ X @ M_w^T               (complex product -> 8 real matmuls)
# For MRI-sized axes (<= 1024) this is the TPU-native choice: 320^3 matmuls
# saturate the MXU while an elementwise FFT would be VPU/HBM-bound; and no
# gather/roll ops are needed for fftshift at all.
# On CPU the native complex FFT is used (exact; keeps golden-parity tests).
# ---------------------------------------------------------------------------

import functools
import os

import jax
import numpy as _np


def _dft_precision():
    """MXU precision for the DFT matmuls. HIGH (bf16x3 compensation) is the
    default: measured on v5e it is +21% end-to-end CIRIM throughput over
    HIGHEST (bf16x6) at 4.8e-5 relative output error through 40 unrolled
    steps — far inside the 1e-3 SSIM-parity budget. Single-pass DEFAULT's
    1.3e-2 per-transform error is not. Override with
    MRIDC_DFT_PRECISION={default,high,highest}.
    """
    name = os.environ.get("MRIDC_DFT_PRECISION", "high").lower()
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


@functools.lru_cache(maxsize=64)
def _dft_mats(n: int, inverse: bool, centered: bool, normalization: str):
    """Constant (real, imag) parts of the combined shift+DFT matrix."""
    eye = _np.eye(n, dtype=_np.complex128)
    fn = _np.fft.ifft if inverse else _np.fft.fft
    cols = _np.fft.ifftshift(eye, axes=0) if centered else eye
    mat = fn(cols, axis=0, norm=_norm(normalization))
    if centered:
        mat = _np.fft.fftshift(mat, axes=0)
    return mat.real.astype(_np.float32), mat.imag.astype(_np.float32)


def dft_mats(n: int, inverse: bool, centered: bool, normalization: str):
    """Public accessor for the combined shift+DFT matrices (real, imag) —
    the external contract for consumers like nn/dc.py's PSF-1D operator."""
    return _dft_mats(n, inverse, centered, normalization)


@functools.lru_cache(maxsize=64)
def _dft_mats_gauss(n: int, inverse: bool, centered: bool, normalization: str):
    """(Mr, Mr+Mi, Mi-Mr) — the three constant matrices of the Gauss
    3-multiplication complex product."""
    mr, mi = _dft_mats(n, inverse, centered, normalization)
    return mr, mr + mi, mi - mr


def _matmul_dft_rv(x, inverse: bool, centered: bool, normalization: str):
    """Complex 2D DFT as 6 real matmuls (Gauss trick, 3 per axis):
      k1 = Mr(xr+xi); k2 = (Mr+Mi)xi; k3 = (Mi-Mr)xr; re = k1-k2; im = k1+k3.
    """
    h, w = x.shape[-3], x.shape[-2]
    h_r, h_sum, h_dif = _dft_mats_gauss(h, inverse, centered, normalization)
    w_r, w_sum, w_dif = _dft_mats_gauss(w, inverse, centered, normalization)
    xr, xi = x[..., 0], x[..., 1]
    ein = functools.partial(jnp.einsum, precision=_dft_precision())

    # transform along h: y[..., h, w] = sum_k M[h, k] x[..., k, w]
    k1 = ein("hk,...kw->...hw", h_r, xr + xi)
    k2 = ein("hk,...kw->...hw", h_sum, xi)
    k3 = ein("hk,...kw->...hw", h_dif, xr)
    tr, ti = k1 - k2, k1 + k3
    # transform along w: y[..., h, w] = sum_k t[..., h, k] M[w, k]
    k1 = ein("...hk,wk->...hw", tr + ti, w_r)
    k2 = ein("...hk,wk->...hw", ti, w_sum)
    k3 = ein("...hk,wk->...hw", tr, w_dif)
    return jnp.stack([k1 - k2, k1 + k3], axis=-1)


def _native_rv(x, inverse: bool, centered: bool, normalization: str):
    z = jax.lax.complex(x[..., 0], x[..., 1])
    fn = ifft2 if inverse else fft2
    z = fn(z, centered=centered, normalization=normalization, spatial_dims=(-2, -1))
    return jnp.stack([z.real, z.imag], axis=-1)


def _rv_dispatch(x, inverse, centered, normalization, use_matmul=None):
    if use_matmul is None:
        use_matmul = jax.default_backend() != "cpu"
    if use_matmul:
        return _matmul_dft_rv(x, inverse, centered, normalization)
    return _native_rv(x, inverse, centered, normalization)


def fft2_rv(
    data: jnp.ndarray,
    centered: bool = False,
    normalization: str = "backward",
    spatial_dims: Optional[Sequence[int]] = None,
    use_matmul: Optional[bool] = None,
) -> jnp.ndarray:
    """2D FFT over a [..., h, w, 2] real view (spatial dims fixed to the two
    axes before the complex axis, the only case the reference models use)."""
    del spatial_dims
    return _rv_dispatch(data, False, centered, normalization, use_matmul)


def ifft2_rv(
    data: jnp.ndarray,
    centered: bool = False,
    normalization: str = "backward",
    spatial_dims: Optional[Sequence[int]] = None,
    use_matmul: Optional[bool] = None,
) -> jnp.ndarray:
    """2D inverse FFT over a [..., h, w, 2] real view."""
    del spatial_dims
    return _rv_dispatch(data, True, centered, normalization, use_matmul)
