"""Learned coil-sensitivity estimation (E2E-VarNet style).

Functional parity with reference: mridc/collections/common/nn/base.py:276-508
``BaseSensitivityModel``: mask the ACS region, IFFT to coil images, run a
NormUnet per coil (coils folded into batch), RSS-normalize.

Layout: real views — kspace [B, C, H, W, 2], mask [B, 1, H, W].
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import cabs2
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["SensitivityModel"]


class SensitivityModel(nn.Module):
    chans: int = 8
    num_pools: int = 4
    mask_type: str = "2D"
    fft_centered: bool = False
    fft_normalization: str = "backward"
    spatial_dims: Sequence[int] = (-2, -1)
    coil_dim: int = 1
    normalize: bool = True
    mask_center: bool = True
    dtype: Optional[str] = None  # opt-in bf16 conv compute for the per-coil
    # NormUnet (params stay f32; ACS masking, FFT and RSS-normalize stay f32)

    @nn.compact
    def __call__(
        self,
        masked_kspace: jnp.ndarray,
        mask: jnp.ndarray,
        num_low_frequencies: Optional[int] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """[B, C, H, W, 2] k-space + [B, 1, H, W] mask -> [B, C, H, W, 2] sens maps."""
        x = masked_kspace
        if self.mask_center:
            if mask.ndim == 3:
                mask = mask[:, None]
            mask_b = jnp.broadcast_to(mask, (x.shape[0], 1) + x.shape[2:4])
            # Reference semantics mirrored exactly (base.py:443-466 +
            # utils.batched_mask_center:379): the ACS width is read from the W
            # profile at H row 0; the band is applied on the H axis for
            # batch size 1 (mask_center "2D") but on the W axis otherwise
            # (batched branch) — an upstream batch-size dependence we pin.
            line = mask_b[:, 0, 0, :].astype(jnp.int8)  # [B, W]
            n = line.shape[1]
            cent = n // 2
            left = jnp.argmin(line[:, :cent][:, ::-1], axis=1)
            right = jnp.argmin(line[:, cent:], axis=1)
            num_low = jnp.maximum(2 * jnp.minimum(left, right), 1)
            if num_low_frequencies is not None and num_low_frequencies > 0:
                num_low = num_low_frequencies * jnp.ones_like(num_low)
            pad = (n - num_low + 1) // 2
            # reference base.py:466 dispatches batched_mask_center with
            # self.mask_type: batch > 1 always bands W (dim 3); batch 1 uses
            # mask_center semantics — H for "2D", W for "1D"
            axis = 3 if (x.shape[0] > 1 or self.mask_type.upper() == "1D") else 2
            idx = jnp.arange(x.shape[axis])
            keep = (idx[None, :] >= pad[:, None]) & (idx[None, :] < (pad + num_low)[:, None])
            shape = [x.shape[0], 1, 1, 1, 1]
            shape[axis] = x.shape[axis]
            keep = keep.reshape(shape)
            x = jnp.where(keep, x, jnp.zeros((), x.dtype))

        images = ifft2_rv(x, self.fft_centered, self.fft_normalization, self.spatial_dims)
        b, c, h, w, _ = images.shape
        per_coil = images.reshape(b * c, h, w, 2)
        est = NormUnet(self.chans, self.num_pools, normalize=self.normalize, dtype=self.dtype)(per_coil, train)
        est = est.reshape(b, c, h, w, 2)
        if self.normalize:
            rss = jnp.sqrt(cabs2(est).sum(axis=self.coil_dim, keepdims=True))[..., None]
            est = est / jnp.maximum(rss, 1e-12)
        return est
