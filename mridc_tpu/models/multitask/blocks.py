"""Shared multitask blocks: exposed-feature UNet encoder/decoder + k-space DC.

Functional parity with reference:
mridc/collections/multitask/rs/nn/idslr_base/idslr_block.py (``DC`` :13 —
``(ref + w*pred) / (mask + w)``, ``UnetEncoder`` :51 — optional group
normalization (unbiased std) + pad-to-``((n-1)|padding_size)+1``,
``UnetDecoder`` :193 — unpad + un-normalize). NHWC; the channel groups
partition the last axis (the reference's [re coils..., im coils...] order
makes group 0 = real parts, group 1 = imaginary parts).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.nn.unet import ConvBlock, TransposeConvBlock

__all__ = ["KSpaceDC", "UnetEncoder", "UnetDecoder", "group_stats", "apply_group_norm"]


class KSpaceDC(nn.Module):
    """Weighted k-space replacement DC (reference idslr_block.py:13-50)."""

    @nn.compact
    def __call__(self, pred_kspace, ref_kspace, mask):
        w = self.param("dc_weight", nn.initializers.ones, (1,))
        m = mask[..., None] if mask.ndim == pred_kspace.ndim - 1 else mask
        return (ref_kspace + w * pred_kspace) / (m + w)


def group_stats(x: jnp.ndarray, groups: int, ddof: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, channel-group) mean/std of an NHWC array. ``ddof=1``
    matches the reference encoder's ``torch.std`` (unbiased)."""
    b, h, w, c = x.shape
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    g = x.reshape(b, h, w, groups, c // groups)
    axes = (1, 2, 4)
    mean = g.mean(axes)
    var = g.var(axes, ddof=ddof)
    return mean, jnp.sqrt(var)


def _group_scale(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """x * scale + shift with per-(sample, group) scalars, NHWC."""
    b, h, w, c = x.shape
    groups = scale.shape[1]
    g = x.reshape(b, h, w, groups, c // groups)
    g = g * scale[:, None, None, :, None] + shift[:, None, None, :, None]
    return g.reshape(b, h, w, c)


def apply_group_norm(x: jnp.ndarray, groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """``torch.nn.functional.group_norm`` semantics with channel groups over
    the LAST axis (channels-last; no affine): biased variance,
    ``(x - mean) * rsqrt(var + eps)`` per (sample, group). Any rank >= 2."""
    b, c = x.shape[0], x.shape[-1]
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    g = x.reshape(b, *x.shape[1:-1], groups, c // groups)
    axes = tuple(range(1, g.ndim - 2)) + (g.ndim - 1,)
    mean = g.mean(axes, keepdims=True)
    var = g.var(axes, keepdims=True)
    g = (g - mean) / jnp.sqrt(var + eps)
    return g.reshape(x.shape)


class UnetEncoder(nn.Module):
    """UNet down path returning the feature stack for decoder sharing
    (reference idslr_block.py:51-191)."""

    chans: int = 32
    num_pools: int = 4
    in_chans: int = 2
    normalize: bool = True
    padding: bool = True
    padding_size: int = 11
    norm_groups: int = 2
    dtype: str = None  # opt-in bf16 conv compute; group norm stats are
    # computed on the f32 input before the cast, params stay f32; the
    # returned feature stack is in the compute dtype

    def pad_sizes(self, h: int, w: int):
        w_mult = ((w - 1) | self.padding_size) + 1
        h_mult = ((h - 1) | self.padding_size) + 1
        w_pad = (math.floor((w_mult - w) / 2), math.ceil((w_mult - w) / 2))
        h_pad = (math.floor((h_mult - h) / 2), math.ceil((h_mult - h) / 2))
        return h_pad, w_pad, h_mult, w_mult

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, C] channels-last (coils folded upstream, [re..., im...]).

        Returns (stack, pad_sizes, mean, std); pad_sizes/mean/std are None when
        padding/normalize are off.
        """
        mean = std = pad_sizes = None
        if self.normalize:
            mean, std = group_stats(x, self.norm_groups, ddof=1)
            x = _group_scale(x, 1.0 / std, -mean / std)
        if self.padding:
            h_pad, w_pad, h_mult, w_mult = self.pad_sizes(x.shape[1], x.shape[2])
            pad_sizes = (h_pad, w_pad, h_mult, w_mult)
            x = jnp.pad(x, ((0, 0), h_pad, w_pad, (0, 0)))
        if self.dtype is not None:
            x = x.astype(self.dtype)

        ch = self.chans
        stack = []
        out = x
        for i in range(self.num_pools):
            out = ConvBlock(ch, dtype=self.dtype)(out, train)
            stack.append(out)
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
            if i < self.num_pools - 1:
                ch *= 2
        out = ConvBlock(ch * 2, dtype=self.dtype)(out, train)
        stack.append(out)
        return stack, pad_sizes, mean, std


class UnetDecoder(nn.Module):
    """UNet up path consuming an encoder feature stack
    (reference idslr_block.py:193-329)."""

    out_chans: int = 2
    chans: int = 32
    num_pools: int = 4
    normalize: bool = True
    padding: bool = True
    norm_groups: int = 2
    dtype: str = None  # opt-in bf16 conv compute; the output is cast back to
    # f32 before unpad/unnormalize

    @nn.compact
    def __call__(
        self,
        stack: Sequence[jnp.ndarray],
        pad_sizes=None,
        mean: Optional[jnp.ndarray] = None,
        std: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        stack = list(stack)
        out = stack.pop()
        ch = self.chans * 2 ** (self.num_pools - 1)
        if self.dtype is not None:
            out = out.astype(self.dtype)
            stack = [s.astype(self.dtype) for s in stack]
        for i in range(self.num_pools):
            skip = stack.pop()
            out = TransposeConvBlock(ch, dtype=self.dtype)(out)
            pad_h = skip.shape[1] - out.shape[1]
            pad_w = skip.shape[2] - out.shape[2]
            if pad_h or pad_w:
                out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            out = jnp.concatenate([out, skip], axis=-1)
            out = ConvBlock(ch, dtype=self.dtype)(out, train)
            if i < self.num_pools - 1:
                ch //= 2
        out = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype)(out)
        if self.dtype is not None:
            out = out.astype(jnp.float32)
        if self.padding and pad_sizes is not None:
            h_pad, w_pad, h_mult, w_mult = pad_sizes
            out = out[:, h_pad[0] : h_mult - h_pad[1], w_pad[0] : w_mult - w_pad[1]]
        if self.normalize and mean is not None and std is not None:
            out = _group_scale(out, std, mean)
        return out
