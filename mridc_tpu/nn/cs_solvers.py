"""Classical compressed-sensing solvers in pure JAX (real-view layout).

Replaces the reference's two external-dependency models:
  - CS via sigpy (reference: mridc/collections/reconstruction/nn/cs.py:19 —
    ``L1WaveletRecon`` / ``TotalVariationRecon``),
  - PICS via the BART C toolbox (reference: nn/pics.py:29 ``bart.bart(...,
    'pics -d0 -g -S -R W:7:0:{reg_wt} -i {num_iters}')``).

Implemented TPU-native: FISTA over the SENSE forward model with either an
orthogonal multi-level Haar wavelet l1 prox or an anisotropic TV prox
(few inner Chambolle-style iterations), all under `lax` control flow so the
solver jits and runs on the MXU-backed FFT path.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["haar_dwt2", "haar_idwt2", "fista_l1_wavelet", "fista_tv"]


_S2 = 1.4142135623730951


def _haar_step(x: jnp.ndarray):
    """One 2D Haar level over [..., H, W] (H, W even): returns (ll, (lh, hl, hh))."""
    a = x[..., 0::2, :]
    b = x[..., 1::2, :]
    lo_r = (a + b) / _S2
    hi_r = (a - b) / _S2
    ll = (lo_r[..., :, 0::2] + lo_r[..., :, 1::2]) / _S2
    lh = (lo_r[..., :, 0::2] - lo_r[..., :, 1::2]) / _S2
    hl = (hi_r[..., :, 0::2] + hi_r[..., :, 1::2]) / _S2
    hh = (hi_r[..., :, 0::2] - hi_r[..., :, 1::2]) / _S2
    return ll, (lh, hl, hh)


def _haar_inv_step(ll, bands):
    lh, hl, hh = bands
    lo_r = jnp.stack([(ll + lh) / _S2, (ll - lh) / _S2], axis=-1).reshape(ll.shape[:-1] + (2 * ll.shape[-1],))
    hi_r = jnp.stack([(hl + hh) / _S2, (hl - hh) / _S2], axis=-1).reshape(hl.shape[:-1] + (2 * hl.shape[-1],))
    h = ll.shape[-2]
    out = jnp.stack([(lo_r + hi_r) / _S2, (lo_r - hi_r) / _S2], axis=-2)
    return out.reshape(out.shape[:-3] + (2 * h, out.shape[-1]))


def haar_dwt2(x: jnp.ndarray, levels: int = 3):
    """Multi-level orthogonal Haar DWT over the trailing two axes (sizes must be
    divisible by 2^levels). Returns (ll, [bands_per_level, coarse->fine])."""
    bands = []
    for _ in range(levels):
        x, b = _haar_step(x)
        bands.append(b)
    return x, bands[::-1]  # coarse-first


def haar_idwt2(ll: jnp.ndarray, bands):
    for b in bands:
        ll = _haar_inv_step(ll, b)
    return ll


def _soft(x, lam):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)


def _pad_pow2(x, levels):
    h, w = x.shape[-3], x.shape[-2]
    mult = 1 << levels
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        pads = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = jnp.pad(x, pads)
    return x, (h, w)


def fista_l1_wavelet(
    y: jnp.ndarray,
    sens: jnp.ndarray,
    mask: jnp.ndarray,
    reg_wt: float = 0.005,
    num_iters: int = 60,
    levels: int = 3,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
    coil_dim: int = 1,
) -> jnp.ndarray:
    """L1-wavelet SENSE reconstruction by FISTA.

    y/sens [B, C, H, W, 2] real views, mask broadcastable; returns [B, H, W, 2].
    Step size 1 assumes normalized sensitivities (sum |S|^2 = 1), the standard
    SENSE normalization, making E^H E a contraction.
    """
    if mask.ndim == y.ndim - 1:
        mask = mask[..., None]

    def e(x):
        return mask * fft2_rv(cmul(x[:, None], sens), fft_centered, fft_normalization, spatial_dims)

    def eh(k):
        return cmul_conj(ifft2_rv(mask * k, fft_centered, fft_normalization, spatial_dims), sens).sum(
            axis=coil_dim
        )

    x0 = eh(y)

    def prox(x, lam):
        # channels (re, im) transform independently; move complex axis in front
        xc = jnp.moveaxis(x, -1, 1)  # [B, 2, H, W]
        xp, (h, w) = _pad_pow2(jnp.moveaxis(xc, 1, -1), levels)  # pad spatial
        xp = jnp.moveaxis(xp, -1, 1)
        ll, bands = haar_dwt2(xp, levels)
        bands = [tuple(_soft(b, lam) for b in lvl) for lvl in bands]
        rec = haar_idwt2(ll, bands)  # approximation coeffs kept un-thresholded
        rec = jnp.moveaxis(rec, 1, -1)[..., :h, :w, :]
        return rec

    def body(_, carry):
        x, z, t = carry
        grad = eh(e(z) - y)
        x_new = prox(z - grad, reg_wt)
        t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        z = x_new + ((t - 1) / t_new) * (x_new - x)
        return x_new, z, t_new

    x, _, _ = jax.lax.fori_loop(0, num_iters, body, (x0, x0, jnp.float32(1.0)))
    return x


def fista_tv(
    y: jnp.ndarray,
    sens: jnp.ndarray,
    mask: jnp.ndarray,
    reg_wt: float = 0.005,
    num_iters: int = 60,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
    coil_dim: int = 1,
) -> jnp.ndarray:
    """Anisotropic-TV SENSE reconstruction: proximal gradient with a soft-
    thresholded-gradient TV surrogate (fast, jittable)."""
    if mask.ndim == y.ndim - 1:
        mask = mask[..., None]

    def e(x):
        return mask * fft2_rv(cmul(x[:, None], sens), fft_centered, fft_normalization, spatial_dims)

    def eh(k):
        return cmul_conj(ifft2_rv(mask * k, fft_centered, fft_normalization, spatial_dims), sens).sum(
            axis=coil_dim
        )

    def tv_prox(x, lam, inner: int = 5):
        # Chambolle-style dual ascent on the anisotropic TV prox
        def grad_h(v):
            return jnp.concatenate([v[..., 1:, :, :] - v[..., :-1, :, :], jnp.zeros_like(v[..., :1, :, :])], -3)

        def grad_w(v):
            return jnp.concatenate([v[..., :, 1:, :] - v[..., :, :-1, :], jnp.zeros_like(v[..., :, :1, :])], -2)

        def div(ph, pw):
            dh = jnp.concatenate([ph[..., :1, :, :], ph[..., 1:-1, :, :] - ph[..., :-2, :, :], -ph[..., -2:-1, :, :]], -3)
            dw = jnp.concatenate([pw[..., :, :1, :], pw[..., :, 1:-1, :] - pw[..., :, :-2, :], -pw[..., :, -2:-1, :]], -2)
            return dh + dw

        ph = jnp.zeros_like(x)
        pw = jnp.zeros_like(x)
        tau = 0.25

        def body(_, carry):
            ph, pw = carry
            u = x - lam * div(ph, pw)
            gh = grad_h(u)
            gw = grad_w(u)
            ph = jnp.clip(ph + tau * gh, -1.0, 1.0)
            pw = jnp.clip(pw + tau * gw, -1.0, 1.0)
            return ph, pw

        ph, pw = jax.lax.fori_loop(0, inner, body, (ph, pw))
        return x - lam * div(ph, pw)

    x0 = eh(y)

    def body(_, carry):
        x, z, t = carry
        grad = eh(e(z) - y)
        x_new = tv_prox(z - grad, reg_wt)
        t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        z = x_new + ((t - 1) / t_new) * (x_new - x)
        return x_new, z, t_new

    x, _, _ = jax.lax.fori_loop(0, num_iters, body, (x0, x0, jnp.float32(1.0)))
    return x
