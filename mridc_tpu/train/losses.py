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

import jax.numpy as jnp
import numpy as np

from mridc_tpu.losses.ssim import ssim_loss
from mridc_tpu.models.base import ModelOutput
from mridc_tpu.ops.cplx import cabs

__all__ = ["base_loss_fn", "process_reconstruction_loss"]


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
) -> jnp.ndarray:
    """Compute the training loss from a model output.

    target: [B, H, W, 2] real view or [B, H, W] real. loss_mask (SSDU) gates magnitudes.
    """
    loss_fn = base_loss_fn(loss_type)
    t = _norm_mag(target)
    if loss_mask is not None:
        t = t * loss_mask

    def single(pred):
        p = _norm_mag(pred)
        if loss_mask is not None:
            p = p * loss_mask
        return loss_fn(t, p)

    if out.intermediates is None:
        return single(out.prediction) * regularization_factor

    inter = out.intermediates
    if inter.ndim == out.prediction.ndim + 1:  # [T, B, H, W, 2] -> one cascade
        inter = inter[None]
    num_cascades, time_steps = inter.shape[0], inter.shape[1]
    weights_sum = float(np.sum(np.logspace(-1, 0, time_steps)))

    # vectorized per-(cascade, time-step) losses
    flat = inter.reshape((-1,) + inter.shape[2:])
    losses = jnp.stack([single(flat[i]) for i in range(flat.shape[0])])
    per_cascade = losses.reshape(num_cascades, time_steps).sum(axis=1) * (weights_sum / time_steps)
    return per_cascade.sum() / num_cascades * regularization_factor
