"""MEGRE signal forward model and analytical likelihood gradient.

Functional parity with reference:
mridc/collections/quantitative/nn/base.py:2015 (``SignalForwardModel``:
``S(TE) = (S0 + i*phi) * exp(-TE*s*R2*) * exp(-i*TE*s*B0)``, scaling 1e-3) and
qrim/utils.py (``analytical_log_likelihood_gradient``, ``RescaleByMax`` :12,
``expand_op`` :37) — vectorized over batch (the reference loops python-side).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = [
    "megre_signal",
    "megre_signal_complex",
    "analytical_log_likelihood_gradient",
    "rescale_by_max",
    "fit_megre_maps",
]

SCALING = 1e-3


def megre_signal(r2star, s0, b0, phi, tes, with_phase: bool = True) -> jnp.ndarray:
    """Maps [B, H, W] -> echo signals [B, E, H, W, 2] (rv).

    Matches reference MEGRESignalModel: treats (S0, phi) as the complex S0 and
    rotates by exp(-i * TE * s * B0), decaying by exp(-TE * s * R2*)."""
    tes = jnp.asarray(tes, jnp.float32)
    t = tes[None, :, None, None] * SCALING  # [1, E, 1, 1]
    decay = jnp.exp(-t * r2star[:, None])
    if not with_phase:
        re = s0[:, None] * decay
        return jnp.stack([re, re], axis=-1)
    cos = jnp.cos(-t * b0[:, None])
    sin = jnp.sin(-t * b0[:, None])
    re = s0[:, None] * decay * cos - phi[:, None] * decay * sin
    im = s0[:, None] * decay * sin + phi[:, None] * decay * cos
    out = jnp.stack([re, im], axis=-1)
    return jnp.nan_to_num(out)


# exp/cosh/sinh argument saturation: |arg| <= 30 keeps every term finite in
# f32 (cosh(30) ~ 5e12) while being exact in any physically meaningful regime
# (trained maps keep |t * B0_imag| << 1; the reference's torch complex math
# overflows to inf/nan here, making from-scratch training with the default
# gammas DOA — saturating instead keeps the max-normalized quantitative loss
# well-defined so training can recover).
_ARG_CLIP = 30.0


def _cexp(z: jnp.ndarray) -> jnp.ndarray:
    """exp of a real-view complex array [..., 2]."""
    ex = jnp.exp(jnp.clip(z[..., 0], -_ARG_CLIP, _ARG_CLIP))
    return jnp.stack([ex * jnp.cos(z[..., 1]), ex * jnp.sin(z[..., 1])], axis=-1)


def _ccos(z: jnp.ndarray) -> jnp.ndarray:
    """cos of a real-view complex array: cos(x)cosh(y) - i sin(x)sinh(y)."""
    y = jnp.clip(z[..., 1], -_ARG_CLIP, _ARG_CLIP)
    return jnp.stack(
        [jnp.cos(z[..., 0]) * jnp.cosh(y), -jnp.sin(z[..., 0]) * jnp.sinh(y)],
        axis=-1,
    )


def _csin(z: jnp.ndarray) -> jnp.ndarray:
    """sin of a real-view complex array: sin(x)cosh(y) + i cos(x)sinh(y)."""
    y = jnp.clip(z[..., 1], -_ARG_CLIP, _ARG_CLIP)
    return jnp.stack(
        [jnp.sin(z[..., 0]) * jnp.cosh(y), jnp.cos(z[..., 0]) * jnp.sinh(y)],
        axis=-1,
    )


def _zero_nan_complex(z: jnp.ndarray) -> jnp.ndarray:
    """Zero complex elements where either component is nan (torch
    ``where(isnan(complex), 0, .)`` semantics)."""
    bad = jnp.isnan(z).any(axis=-1, keepdims=True)
    return jnp.where(bad, 0.0, z)


def megre_signal_complex(r2star, s0, b0, phi, tes) -> jnp.ndarray:
    """MEGRE forward model for COMPLEX quantitative maps in real view.

    The reference qVN threads complex maps between cascades and runs
    ``MEGRESignalModel`` on them (quantitative/nn/base.py:2063-2113 with
    complex tensors; qvn.py:210-245): every term — ``exp(-t R2*)``,
    ``cos(-t B0)``, ``sin(-t B0)``, the S0/phi products — is complex, and the
    final echo is reassembled as ``view_as_real(a + i b)`` where a and b are
    themselves complex: ``out = (Re a - Im b) + i (Im a + Re b)``.

    maps: [B, H, W, 2] real view each. Returns [B, E, H, W, 2].
    With zero imaginary parts this reduces exactly to :func:`megre_signal`.
    """
    tes = jnp.asarray(tes, jnp.float32)
    t = tes[None, :, None, None, None] * SCALING  # [1, E, 1, 1, 1]
    r2s_e = r2star[:, None]  # [B, 1, H, W, 2]
    b0_e = b0[:, None]
    s0_e = s0[:, None]
    phi_e = phi[:, None]
    first = _cexp(-t * r2s_e)
    second = _ccos(-t * b0_e)
    third = _csin(-t * b0_e)
    s0f = cmul(s0_e, first)
    phif = cmul(phi_e, first)
    a = cmul(s0f, second) - cmul(phif, third)
    b = cmul(s0f, third) + cmul(phif, second)
    a = _zero_nan_complex(a)
    b = _zero_nan_complex(b)
    return jnp.stack([a[..., 0] - b[..., 1], a[..., 1] + b[..., 0]], axis=-1)


def analytical_log_likelihood_gradient(
    r2star,
    s0,
    b0,
    phi,
    tes,
    sens,
    masked_kspace,
    sampling_mask,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
    spatial_dims: Sequence[int] = (-2, -1),
    coil_dim: int = 2,
) -> jnp.ndarray:
    """Gradient channels [B, 4, H, W] = [dR2*_re, dS0_re, dR2*_im, dS0_im]
    (the imaginary parts drive B0/phi; reference qrim/utils.py:110-213).

    masked_kspace [B, E, C, H, W, 2]; sens [B, C, H, W, 2];
    sampling_mask broadcastable [B, 1, 1, H, W, 1]-ish.
    """
    tes = jnp.asarray(tes, jnp.float32)
    pred = megre_signal(r2star, s0, b0, phi, tes)  # [B, E, H, W, 2]
    sens_e = sens[:, None]  # [B, 1, C, H, W, 2]
    pred_k = fft2_rv(cmul(pred[:, :, None], sens_e), fft_centered, fft_normalization, spatial_dims)
    if sampling_mask.ndim == masked_kspace.ndim - 1:
        sampling_mask = sampling_mask[..., None]
    diff = (pred_k - masked_kspace) * sampling_mask
    diff_img = cmul_conj(
        ifft2_rv(diff, fft_centered, fft_normalization, spatial_dims), sens_e
    ).sum(axis=coil_dim)  # [B, E, H, W, 2]

    t = tes[None, :, None, None] * SCALING
    decay = jnp.exp(-t * r2star[:, None])
    cos = jnp.cos(-t * b0[:, None])
    sin = jnp.sin(-t * b0[:, None])

    s0_der = jnp.stack([decay * cos, -decay * sin], axis=-1)
    r2_der = jnp.stack(
        [
            -t * decay * (s0[:, None] * cos - phi[:, None] * sin),
            -t * decay * (-s0[:, None] * sin - phi[:, None] * cos),
        ],
        axis=-1,
    )

    s0_grad = cmul(diff_img, s0_der).mean(axis=1)  # [B, H, W, 2], mean over echoes
    r2_grad = cmul(diff_img, r2_der).mean(axis=1)
    return jnp.stack([r2_grad[..., 0], s0_grad[..., 0], r2_grad[..., 1], s0_grad[..., 1]], axis=1)


def rescale_by_max(data: jnp.ndarray, slack: float = 1e-6):
    """Per-(batch, map) max-rescale; returns (scaled, gamma) (reference RescaleByMax)."""
    gamma = jnp.abs(data).max(axis=(-2, -1), keepdims=True) + slack
    return data / gamma, gamma


def fit_megre_maps(echo_images: jnp.ndarray, tes) -> jnp.ndarray:
    """Inverse of :func:`megre_signal`: echo images [B, E, H, W, 2] (rv) ->
    maps [B, H, W, 4] = (R2*, S0, B0, phi).

    TPU-native re-initialization used by the qCIRIM reconstruction module
    (reference qcirim.py:212-235 re-fits with
    ``transforms.R2star_B0_S0_phi_mapping``, whose B0 step runs skimage's
    host-sequential ``unwrap_phase`` under an implicit detach). Here the fit
    is fully jittable AND differentiable:

    - magnitude: log-linear least squares over TE -> R2* (slope) and the
      complex-S0 amplitude (intercept);
    - B0: least-squares slope of the PAIRWISE wrapped phase differences
      ``angle(S_{e+1} conj(S_e))`` — no absolute spatial unwrap needed, exact
      while ``|B0| * s * dTE < pi`` (documented deviation, PARITY.md);
    - (S0, phi): amplitude * (cos, sin) of the B0-derotated mean phase.
    """
    tes = jnp.asarray(tes, jnp.float32)
    t = tes * SCALING  # [E]
    re, im = echo_images[..., 0], echo_images[..., 1]
    mag = jnp.sqrt(re**2 + im**2)
    logm = jnp.log(jnp.maximum(mag, 1e-12))  # [B, E, H, W]

    t_mean = t.mean()
    t_ctr = (t - t_mean)[None, :, None, None]
    t_var = jnp.maximum((t_ctr**2).sum(1), 1e-20)
    slope = (logm * t_ctr).sum(axis=1) / t_var  # d log|S| / dt = -R2*
    r2star = -slope
    # clamped intercept: noise voxels can push exp() to overflow scales
    amp = jnp.exp(jnp.clip(logm.mean(axis=1) - slope * t_mean, -30.0, 30.0))

    # pairwise wrapped phase differences: angle(S_{e+1}) - angle(S_e) mod 2pi
    zr, zi = re, im
    pr = zr[:, 1:] * zr[:, :-1] + zi[:, 1:] * zi[:, :-1]
    pi_ = zi[:, 1:] * zr[:, :-1] - zr[:, 1:] * zi[:, :-1]
    dphi = jnp.arctan2(pi_, pr)  # [B, E-1, H, W]
    dt = (t[1:] - t[:-1])[None, :, None, None]
    # least squares of dphi = -B0 * dt over the pairs
    b0 = -(dphi * dt).sum(1) / jnp.maximum((dt**2).sum(1), 1e-20)

    # intercept phase: de-rotate each echo by the fitted B0 and average units
    theta = jnp.arctan2(zi, zr) + t[None, :, None, None] * b0[:, None]
    ur = jnp.cos(theta).sum(axis=1)
    ui = jnp.sin(theta).sum(axis=1)
    theta0 = jnp.arctan2(ui, ur)
    s0 = amp * jnp.cos(theta0)
    phi = amp * jnp.sin(theta0)
    return jnp.nan_to_num(jnp.stack([r2star, s0, b0, phi], axis=-1))
