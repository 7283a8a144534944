"""fastMRI-style U-Net family in Flax (NHWC).

Functional parity with reference:
mridc/collections/reconstruction/nn/unet_base/unet_block.py
(``NormUnet`` :11, ``Unet`` :145, ``ConvBlock`` :246, ``TransposeConvBlock``
:294): two 3x3 conv + InstanceNorm + LeakyReLU(0.2) blocks, avg-pool
downsampling, transpose-conv upsampling with skip concat, group-normalized and
16-padded wrapper for complex inputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.nn.layers import InstanceNorm

__all__ = ["ConvBlock", "TransposeConvBlock", "Unet", "NormUnet"]


class ConvBlock(nn.Module):
    out_chans: int
    drop_prob: float = 0.0
    dtype: Optional[str] = None  # conv compute dtype (bf16 feeds the MXU at
    # full rate; params stay f32; InstanceNorm stats run f32 either way).
    # None = f32 — bit-identical to the pre-dtype behavior.

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = InstanceNorm()(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x


class TransposeConvBlock(nn.Module):
    out_chans: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.out_chans, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        return nn.leaky_relu(x, 0.2)


class Unet(nn.Module):
    out_chans: int
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0
    dtype: Optional[str] = None  # compute dtype for every conv (see ConvBlock)

    @nn.compact
    def __call__(self, x, train: bool = False):
        stack = []
        ch = self.chans
        out = x if self.dtype is None else x.astype(self.dtype)
        for i in range(self.num_pool_layers):
            out = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(out, train)
            stack.append(out)
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
            if i < self.num_pool_layers - 1:
                ch *= 2

        out = ConvBlock(ch * 2, self.drop_prob, dtype=self.dtype)(out, train)

        for i in range(self.num_pool_layers):
            skip = stack.pop()
            out = TransposeConvBlock(ch, dtype=self.dtype)(out)
            # odd-size inputs: reflect-pad on the right/bottom to match skip
            pad_h = skip.shape[1] - out.shape[1]
            pad_w = skip.shape[2] - out.shape[2]
            if pad_h or pad_w:
                out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            out = jnp.concatenate([out, skip], axis=-1)
            if i < self.num_pool_layers - 1:
                out = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(out, train)
                ch //= 2
            else:
                out = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(out, train)
                out = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype)(out)
        return out if self.dtype is None else out.astype(jnp.float32)

    # NOTE: channel schedule mirrors the reference: down chans, 2c, 4c, 8c;
    # bottleneck 16c; ups mirror back.


class NormUnet(nn.Module):
    """Group-normalized, pad-to-multiple U-Net over channelized complex input.

    Input/output: [B, H, W, C] real channels (C = 2*coils for complex data).
    """

    chans: int = 32
    num_pools: int = 4
    in_chans: int = 2
    out_chans: int = 2
    drop_prob: float = 0.0
    padding_size: int = 15
    normalize: bool = True
    norm_groups: int = 2
    dtype: Optional[str] = None  # conv compute dtype for the wrapped Unet;
    # the group norm/unnorm wrapper stays f32 (Unet casts back at its output)

    def _norm(self, x):
        b, h, w, c = x.shape
        xg = x.transpose(0, 3, 1, 2).reshape(b, self.norm_groups, -1)
        mean = xg.mean(-1, keepdims=True)
        std = xg.std(-1, keepdims=True, ddof=1) + 1e-12
        xg = (xg - mean) / std
        return xg.reshape(b, c, h, w).transpose(0, 2, 3, 1), mean, std

    def _unnorm(self, x, mean, std):
        b, h, w, c = x.shape
        xg = x.transpose(0, 3, 1, 2).reshape(b, self.norm_groups, -1)
        xg = xg * std + mean
        return xg.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    def _pad(self, x) -> Tuple[jnp.ndarray, Tuple]:
        _, h, w, _ = x.shape
        w_mult = ((w - 1) | self.padding_size) + 1
        h_mult = ((h - 1) | self.padding_size) + 1
        w_pad = ((w_mult - w) // 2, (w_mult - w + 1) // 2)
        h_pad = ((h_mult - h) // 2, (h_mult - h + 1) // 2)
        x = jnp.pad(x, ((0, 0), h_pad, w_pad, (0, 0)))
        return x, (h_pad, w_pad, h_mult, w_mult)

    @staticmethod
    def _unpad(x, h_pad, w_pad, h_mult, w_mult):
        return x[:, h_pad[0] : h_mult - h_pad[1], w_pad[0] : w_mult - w_pad[1], :]

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = std = None
        if self.normalize:
            x, mean, std = self._norm(x)
        x, pads = self._pad(x)
        x = Unet(self.out_chans, self.chans, self.num_pools, self.drop_prob, dtype=self.dtype)(x, train)
        x = self._unpad(x, *pads)
        if self.normalize:
            x = self._unnorm(x, mean, std)
        return x
