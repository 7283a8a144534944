"""Reconstruction-model base: shared config fields and output container.

Plays the role of reference mridc/collections/reconstruction/nn/base.py's
``BaseMRIReconstructionModel`` *module* side (the training/eval step logic
lives in :mod:`mridc_tpu.train.trainer`, keeping modules pure functions).

Device layout: real views ``[..., 2]`` throughout (see mridc_tpu.ops.cplx) —
the TPU backend executes no complex64 ops.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from mridc_tpu.nn.dc import sens_reduce
from mridc_tpu.ops.cplx import ccombine
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["ModelOutput", "BaseReconModel", "expand_mask", "check_dc_mode"]


@flax.struct.dataclass
class ModelOutput:
    """prediction: final image [B, H, W, 2] real view.
    intermediates: optional stacked per-step predictions [..., B, H, W, 2] used
    by logspace-weighted losses (CIRIM/CRNN accumulate_predictions semantics).
    recon_intermediates: optional per-echo reconstruction stack
    [E, C, T, B, H, W, 2] from a quantitative model's folded reconstruction
    module (reference qcirim.py:401-458 lossrecon accumulate path)."""

    prediction: jnp.ndarray
    intermediates: Optional[jnp.ndarray] = None
    recon_intermediates: Optional[jnp.ndarray] = None


def check_dc_mode(mode: str) -> str:
    """Validate the dc_mode config value (loud failure beats a silent
    fall-through to the full-DC path)."""
    if mode not in ("full", "psf1d"):
        raise ValueError(f"dc_mode must be 'full' or 'psf1d', got {mode!r}")
    return mode


def expand_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Ensure a mask broadcastable to [B, C, H, W] (adds the coil axis)."""
    if mask.ndim == 3:  # [B, H, W] or [B, 1, W]
        mask = mask[:, None]
    return mask


class BaseReconModel(nn.Module):
    """Common config fields; subclasses implement ``__call__(y, sens, mask,
    init_pred=None, train=False) -> ModelOutput``.

    Inputs (real views):
      y [B, C, H, W, 2] float32 — masked k-space
      sens [B, C, H, W, 2] float32
      mask [B, 1, H, W] float32 (broadcastable)
      init_pred [B, H, W, 2] float32 or None
    """

    fft_centered: bool = False
    fft_normalization: str = "backward"
    spatial_dims: Sequence[int] = (-2, -1)
    coil_dim: int = 1
    coil_combination_method: str = "SENSE"

    def zero_filled(self, y: jnp.ndarray, sens: jnp.ndarray) -> jnp.ndarray:
        """SENSE/RSS combine of the zero-filled reconstruction -> [B, H, W, 2]."""
        img = ifft2_rv(y, self.fft_centered, self.fft_normalization, self.spatial_dims)
        return ccombine(img, sens, self.coil_combination_method, self.coil_dim)

    def sense_init(self, y: jnp.ndarray, sens: jnp.ndarray) -> jnp.ndarray:
        return sens_reduce(
            y, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
        )

    @staticmethod
    def pick(cfg: Dict[str, Any], key: str, default=None):
        v = cfg.get(key, default)
        return default if v is None else v
