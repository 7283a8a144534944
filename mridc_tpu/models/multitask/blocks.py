"""Shared multitask blocks: exposed-feature UNet encoder/decoder + k-space DC.

Functional parity with reference:
mridc/collections/multitask/rs/nn/idslr_base/idslr_block.py (``DC`` :13 —
``(ref + w*pred) / (mask + w)``, ``UnetEncoder`` :51, ``UnetDecoder`` :193).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.nn.unet import ConvBlock, TransposeConvBlock

__all__ = ["KSpaceDC", "UnetEncoder", "UnetDecoder"]


class KSpaceDC(nn.Module):
    """Weighted k-space replacement DC (reference idslr_block.py:13-50)."""

    @nn.compact
    def __call__(self, pred_kspace, ref_kspace, mask):
        w = self.param("dc_weight", nn.initializers.ones, (1,))
        m = mask[..., None] if mask.ndim == pred_kspace.ndim - 1 else mask
        return (ref_kspace + w * pred_kspace) / (m + w)


class UnetEncoder(nn.Module):
    """UNet down path returning the feature stack for decoder sharing."""

    chans: int = 32
    num_pools: int = 4
    in_chans: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # x: [B, H, W, C] channels-last (coils folded into channels upstream)
        ch = self.chans
        stack = []
        out = x
        for i in range(self.num_pools):
            out = ConvBlock(ch)(out, train)
            stack.append(out)
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
            if i < self.num_pools - 1:
                ch *= 2
        out = ConvBlock(ch * 2)(out, train)
        stack.append(out)
        return stack


class UnetDecoder(nn.Module):
    """UNet up path consuming an encoder feature stack."""

    out_chans: int = 2
    chans: int = 32
    num_pools: int = 4

    @nn.compact
    def __call__(self, stack: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        stack = list(stack)
        out = stack.pop()
        ch = self.chans * 2 ** (self.num_pools - 1)
        for i in range(self.num_pools):
            skip = stack.pop()
            out = TransposeConvBlock(ch)(out)
            pad_h = skip.shape[1] - out.shape[1]
            pad_w = skip.shape[2] - out.shape[2]
            if pad_h or pad_w:
                out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            out = jnp.concatenate([out, skip], axis=-1)
            out = ConvBlock(ch)(out, train)
            if i < self.num_pools - 1:
                ch //= 2
        return nn.Conv(self.out_chans, (1, 1))(out)
