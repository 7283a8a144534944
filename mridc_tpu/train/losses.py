"""Reconstruction loss processing (jittable).

Functional parity with reference:
mridc/collections/reconstruction/nn/base.py ``process_reconstruction_loss``
(:498) and the CIRIM override (nn/cirim.py:171): magnitude images normalized by
their max, L1/L2/SSIM base losses, and the accumulated-prediction weighting
``sum_t(loss_t) * sum(logspace(-1,0,T))/T`` per cascade, averaged over cascades
(this reproduces the reference's arithmetic at nn/cirim.py:351-363 exactly).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mridc_tpu.losses.ssim import ssim_loss
from mridc_tpu.models.base import ModelOutput
from mridc_tpu.ops.cplx import cabs, cmul
from mridc_tpu.ops.fft import fft2_rv

__all__ = ["base_loss_fn", "expand_op", "process_reconstruction_loss"]


def expand_op(x: jnp.ndarray, sensitivity_maps: jnp.ndarray, coil_dim: int = 1) -> jnp.ndarray:
    """Expand a coil-combined image [..., H, W, 2] to multicoil with S_c * x.

    The reference *calls* a 3-arg ``utils.expand_op(x, sens, coil_dim)`` in its
    k-space loss branch (reconstruction/nn/base.py:224,281) but never defines
    it in ``common/parts/utils.py`` — the only definitions are the 2-arg
    quantitative ones (``complex_mul(x, sens)``, quantitative/nn/qrim/utils.py:37).
    We implement the evident intent: unsqueeze at ``coil_dim`` and complex-
    multiply by the maps (documented as a pinned upstream bug in PARITY.md).
    """
    return cmul(jnp.expand_dims(x, coil_dim), sensitivity_maps)


def _norm_mag(x: jnp.ndarray) -> jnp.ndarray:
    """Magnitude normalized by its max; accepts [..., 2] real views or real arrays."""
    mag = cabs(x) if x.shape[-1] == 2 else jnp.abs(x)
    return mag / jnp.maximum(mag.max(), 1e-12)


def base_loss_fn(name: str) -> Callable:
    name = str(name).lower()
    if name in ("l1", "mae"):
        return lambda t, p: jnp.abs(t - p).mean()
    if name in ("l2", "mse"):
        return lambda t, p: ((t - p) ** 2).mean()
    if name == "ssim":
        return lambda t, p: ssim_loss(t[:, None], p[:, None], jnp.ones((t.shape[0],), jnp.float32))
    raise ValueError(f"Unknown loss {name!r} (choose l1 / l2 / mse / ssim)")


def process_reconstruction_loss(
    out: ModelOutput,
    target: jnp.ndarray,
    loss_type: str = "l1",
    regularization_factor: float = 1.0,
    loss_mask: Optional[jnp.ndarray] = None,
    sensitivity_maps: Optional[jnp.ndarray] = None,
    kspace_loss: bool = False,
    fft_centered: bool = False,
    fft_normalization: str = "backward",
) -> jnp.ndarray:
    """Compute the training loss from a model output.

    target: [B, H, W, 2] real view or [B, H, W] real. loss_mask (SSDU) gates magnitudes.

    ``kspace_loss`` selects the reference's k-space branch
    (reconstruction/nn/base.py:218-285): target and prediction are expanded to
    multicoil with the sensitivity maps, transformed with ``fft2`` using the
    model's fft settings, and the *prediction's* k-space is gated by
    ``loss_mask`` (the target is left unmasked, as in the reference); the base
    loss then acts on the raw real-view k-space, with no max-normalization.

    Gating parity (verified against the reference's actual code in
    tests/test_golden_loss.py): the branch activates only when
    ``self.kspace_reconstruction_loss`` (config) or the per-call
    ``kspace_reconstruction_loss`` argument is set — the reference passes
    ``self.ssdu`` as that argument only for the n2r+ssdu pseudo-supervised
    term (base.py:439,483). ``ssdu`` alone trains *image-domain* magnitudes,
    and in that image branch the reference never applies the loss mask —
    ``loss_mask`` is therefore ignored here unless ``kspace_loss`` is True.
    """
    loss_fn = base_loss_fn(loss_type)
    if kspace_loss:
        if loss_type.lower() == "ssim":
            # The reference's SSIM wrapper always normalizes image magnitudes
            # and unsqueezes a coil dim (base.py:227-251) — combined with a
            # multicoil k-space target its shapes cannot match, so the
            # combination is unusable upstream too. Fail loudly.
            raise ValueError("SSIM loss is not defined in k-space mode (matches reference behavior)")
        if sensitivity_maps is None:
            raise ValueError("kspace_loss=True requires sensitivity_maps")
        km = None
        if loss_mask is not None:
            km = loss_mask
            if km.ndim == 4:  # [B, 1, H, W] -> [B, H, W]
                km = km[:, 0]
            if km.ndim != 3:
                raise ValueError(f"loss_mask must be [B, H, W] or [B, 1, H, W], got {loss_mask.shape}")
            km = km[:, None, :, :, None]  # broadcast over coil + complex dims
        t = fft2_rv(expand_op(target, sensitivity_maps), fft_centered, fft_normalization)

        def single(pred):
            p = fft2_rv(expand_op(pred, sensitivity_maps), fft_centered, fft_normalization)
            if km is not None:
                p = p * km
            return loss_fn(t, p)

    else:
        t = _norm_mag(target)

        def single(pred):
            return loss_fn(t, _norm_mag(pred))

    if out.intermediates is None:
        return single(out.prediction) * regularization_factor

    inter = out.intermediates
    if inter.ndim == out.prediction.ndim + 1:  # [T, B, H, W, 2] -> one cascade
        inter = inter[None]
    num_cascades, time_steps = inter.shape[0], inter.shape[1]
    weights_sum = float(np.sum(np.logspace(-1, 0, time_steps)))

    # per-(cascade, time-step) losses with ONE traced instance of the loss
    # subgraph (a python loop would duplicate the expand/fft chain C*T times
    # in the jitted step, bloating HLO and compile time)
    flat = inter.reshape((-1,) + inter.shape[2:])
    losses = jax.vmap(single)(flat)
    per_cascade = losses.reshape(num_cascades, time_steps).sum(axis=1) * (weights_sum / time_steps)
    return per_cascade.sum() / num_cascades * regularization_factor
