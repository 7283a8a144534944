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

__all__ = ["fft2c", "ifft2c", "fft2", "ifft2", "fftshift", "ifftshift"]


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
