"""Multi-domain (image + k-space) conv blocks and UNet.

Functional parity with reference:
mridc/collections/reconstruction/nn/multidomain/multidomain.py
(``MultiDomainConv2d`` :15, ``MultiDomainConvTranspose2d``,
``MultiDomainConvBlock``, ``StandardizationLayer`` :288,
``MultiDomainUnet2d`` :336): every conv has an image-space branch and a
k-space branch (FFT per 2-channel complex pair), concatenated.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.nn.layers import InstanceNorm
from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["MultiDomainConv", "MultiDomainConvBlock", "StandardizationLayer", "MultiDomainUnet2d"]


def _pairwise_fft(x, inverse, fft_centered, fft_normalization):
    """Apply the rv FFT to each consecutive (re, im) channel pair of [B, H, W, C]."""
    b, h, w, c = x.shape
    pairs = x.reshape(b, h, w, c // 2, 2)
    pairs = jnp.moveaxis(pairs, 3, 1)  # [B, c/2, H, W, 2]
    fn = ifft2_rv if inverse else fft2_rv
    pairs = fn(pairs, fft_centered, fft_normalization)
    pairs = jnp.moveaxis(pairs, 1, 3)
    return pairs.reshape(b, h, w, c)


class MultiDomainConv(nn.Module):
    out_channels: int
    transpose: bool = False
    fft_centered: bool = False
    fft_normalization: str = "backward"
    dtype: str = None  # conv compute dtype; the per-pair feature FFTs run in
    # f32 regardless (their DFT matmuls are precision-laddered separately)

    @nn.compact
    def __call__(self, x):
        def feature_fft(v, inverse):
            out = _pairwise_fft(v.astype(jnp.float32), inverse, self.fft_centered, self.fft_normalization)
            return out.astype(v.dtype)

        if self.transpose:
            img = nn.ConvTranspose(self.out_channels // 2, (2, 2), strides=(2, 2), use_bias=False,
                                   dtype=self.dtype)(x)
            k = feature_fft(x, False)
            k = nn.ConvTranspose(self.out_channels // 2, (2, 2), strides=(2, 2), use_bias=False,
                                 dtype=self.dtype)(k)
        else:
            img = nn.Conv(self.out_channels // 2, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            k = feature_fft(x, False)
            k = nn.Conv(self.out_channels // 2, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(k)
        k = feature_fft(k, True)
        return jnp.concatenate([img, k], axis=-1)


class MultiDomainConvBlock(nn.Module):
    out_channels: int
    drop_prob: float = 0.0
    fft_centered: bool = False
    fft_normalization: str = "backward"
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = MultiDomainConv(self.out_channels, False, self.fft_centered, self.fft_normalization,
                                dtype=self.dtype)(x)
            x = InstanceNorm()(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x


class StandardizationLayer(nn.Module):
    """Per-coil (sense-combined, residual) pairs (reference :288-335).

    coil_images/sens [B, C, H, W, 2] -> [B, C, H, W, 4]."""

    coil_dim: int = 1

    def __call__(self, coil_images, sens):
        combined = cmul_conj(coil_images, sens).sum(axis=self.coil_dim)
        residual = combined[:, None] - cmul(combined[:, None], sens)
        combined_b = jnp.broadcast_to(combined[:, None], residual.shape)
        return jnp.concatenate([combined_b, residual], axis=-1)


class MultiDomainUnet2d(nn.Module):
    out_channels: int = 2
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0
    fft_centered: bool = False
    fft_normalization: str = "backward"
    dtype: str = None  # opt-in bf16 conv compute (feature FFTs and
    # InstanceNorm stats stay f32; params stay f32; output cast back to f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ch = self.chans
        stack = []
        out = x
        for i in range(self.num_pool_layers):
            out = MultiDomainConvBlock(ch, self.drop_prob, self.fft_centered, self.fft_normalization,
                                       dtype=self.dtype)(out, train)
            stack.append(out)
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
            if i < self.num_pool_layers - 1:
                ch *= 2
        out = MultiDomainConvBlock(ch * 2, self.drop_prob, self.fft_centered, self.fft_normalization,
                                   dtype=self.dtype)(out, train)
        for i in range(self.num_pool_layers):
            skip = stack.pop()
            out = MultiDomainConv(ch, True, self.fft_centered, self.fft_normalization, dtype=self.dtype)(out)
            # reference TransposeMultiDomainConvBlock = convT + InstanceNorm +
            # LeakyReLU (multidomain.py:233-234)
            out = InstanceNorm()(out)
            out = nn.leaky_relu(out, 0.2)
            pad_h = skip.shape[1] - out.shape[1]
            pad_w = skip.shape[2] - out.shape[2]
            if pad_h or pad_w:
                out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            out = jnp.concatenate([out, skip], axis=-1)
            out = MultiDomainConvBlock(ch, self.drop_prob, self.fft_centered, self.fft_normalization,
                                       dtype=self.dtype)(out, train)
            if i < self.num_pool_layers - 1:
                ch //= 2
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(out).astype(in_dtype)
