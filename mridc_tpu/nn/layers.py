"""Shared NN building blocks: complex<->channel adapters, padded convs.

Layout: all convolutions run in NHWC (TPU-native; the MXU consumes the
channel-contracted layout directly). Complex images ``[B, H, W]`` map to
``[B, H, W, 2]`` real channels; multicoil ``[B, C, H, W]`` maps to
``[B, H, W, 2C]`` with the reference's ``[re coils..., im coils...]`` channel
order (reference: mridc/collections/reconstruction/nn/unet_base/unet_block.py:62
``complex_to_chan_dim`` permute(0,4,1,2,3)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "complex_to_channels",
    "channels_to_complex",
    "coils_complex_to_channels",
    "channels_to_coils_complex",
    "InstanceNorm",
    "ConvNonlinear",
]


def complex_to_channels(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] complex -> [..., H, W, 2] real."""
    return jnp.stack([x.real, x.imag], axis=-1)


def channels_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 2] real -> [..., H, W] complex."""
    return jax.lax.complex(x[..., 0], x[..., 1])


def coils_complex_to_channels(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] complex -> [B, H, W, 2C] real, channel order [re..., im...]."""
    b, c, h, w = x.shape
    stacked = jnp.concatenate([x.real, x.imag], axis=1)  # [B, 2C, H, W]
    return jnp.transpose(stacked, (0, 2, 3, 1))


def channels_to_coils_complex(x: jnp.ndarray, coils: int) -> jnp.ndarray:
    """[B, H, W, 2C] real -> [B, C, H, W] complex."""
    nchw = jnp.transpose(x, (0, 3, 1, 2))
    re, im = nchw[:, :coils], nchw[:, coils:]
    return jax.lax.complex(re, im)


class InstanceNorm(nn.Module):
    """Per-channel, per-sample normalization over H, W (torch InstanceNorm2d,
    affine=False, eps=1e-5)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = x.mean(axis=(-3, -2), keepdims=True)
        var = x.var(axis=(-3, -2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class ConvNonlinear(nn.Module):
    """Replication-padded conv + nonlinearity (reference:
    mridc/collections/reconstruction/nn/rim/conv_layers.py:44 ``ConvNonlinear``
    — ReplicationPad2d then VALID Conv2d). ``dtype`` selects the compute dtype
    (bf16 feeds the MXU at full rate; params stay f32)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    nonlinear: Optional[str] = "relu"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.dilation * (self.kernel_size - 1) // 2
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
        )(x)
        if self.nonlinear is None or self.nonlinear.lower() == "none":
            return x
        if self.nonlinear.lower() == "relu":
            return nn.relu(x)
        if self.nonlinear.lower() == "leakyrelu":
            return nn.leaky_relu(x, 0.01)
        raise ValueError(f"Unknown nonlinearity {self.nonlinear!r}")
