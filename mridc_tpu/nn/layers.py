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
    "Conv",
    "InstanceNorm",
    "ConvNonlinear",
    "TorchBatchNorm",
    "bilinear_resize",
    "nearest_resize",
]


class Conv(nn.Conv):
    """``nn.Conv`` that can lower pointwise (1x1, stride-1, ungrouped,
    unmasked) kernels to an explicit channel matmul.

    In isolation the matmul form beats XLA's conv lowering (3.8 vs 6.3
    ms/step at [32, 320, 320, 64] bf16 on v5e inside a scan), but inside the
    full RIM graph it breaks conv<->conv fusion and *loses* at inference
    (39.8 -> 23.3 slices/s) while winning in the training step (+13%), so the
    lowering is opt-in per instance via ``pointwise_matmul``. Parameters
    (``kernel`` [1, 1, in, out], optional ``bias``), initializer calls, and
    numerics are identical to ``nn.Conv``; non-pointwise configurations fall
    through to ``nn.Conv``.
    """

    pointwise_matmul: bool = False
    lane_fold: bool = False  # input/output in folded layout [B, H, W/2, 2C];
    # params stay in the standard [kh, kw, cin, cout] layout (see nn/fold.py)
    fold_pad_mode: str = "zero"  # halo semantics: "zero" (SAME) | "edge"

    def _folded_call(self, x: jnp.ndarray) -> jnp.ndarray:
        from mridc_tpu.nn.fold import fold_kernel, fold_pad_amount, halo_pad_folded

        if self.fold_pad_mode not in ("zero", "edge"):
            raise ValueError(f"fold_pad_mode must be 'zero' or 'edge', got {self.fold_pad_mode!r}")
        k = self.kernel_size
        kh, kw = (k, k) if isinstance(k, int) else tuple(k)
        d = self.kernel_dilation if self.kernel_dilation is not None else 1
        dh, dw = (d, d) if isinstance(d, int) else tuple(d)
        cin = x.shape[-1] // 2
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype) if self.use_bias else None
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        kf = fold_kernel(kernel, dw)
        rh = (kh - 1) // 2
        if rh:
            h_mode = "edge" if self.fold_pad_mode == "edge" else "constant"
            x = jnp.pad(x, ((0, 0), (rh * dh, rh * dh), (0, 0), (0, 0)), mode=h_mode)
        pad = fold_pad_amount(kw, dw)
        assert pad in (0, 2), f"lane folding supports one halo slot, kernel {kw} dilation {dw} needs pad {pad}"
        if pad:
            x = halo_pad_folded(x, cin, self.fold_pad_mode)
        y = jax.lax.conv_general_dilated(
            x,
            kf,
            (1, 1),
            "VALID",
            rhs_dilation=(dh, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )
        if bias is not None:
            y = y + jnp.tile(bias, 2)
        return y

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.lane_fold:
            return self._folded_call(x)
        k = self.kernel_size
        k = (k, k) if isinstance(k, int) else tuple(k)
        s = self.strides if self.strides is not None else 1
        s = (s, s) if isinstance(s, int) else tuple(s)
        pointwise = (
            self.pointwise_matmul
            and k == (1, 1)
            and s == (1, 1)
            and self.feature_group_count == 1
            and self.mask is None
        )
        if not pointwise:
            return super().__call__(x)
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (1, 1, in_features, self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype) if self.use_bias else None
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jnp.einsum("...c,cd->...d", x, kernel[0, 0], precision=self.precision)
        if bias is not None:
            y = y + bias
        return y


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch semantics (reference torch.nn.BatchNorm2d users:
    mwcnn/mwcnn.py:154, conv/conv2d.py:53, vnet_base/vnet_block.py:33,
    lambda_unet_base/lambda_unet_block.py:70).

    Two modes:

    ``live=False`` (default, import parity): running ``mean``/``var`` live in
    the params collection so golden tests can import them from reference
    checkpoints. Train mode normalizes with current batch statistics (torch
    train behavior); eval uses the stored stats, which are stop-gradiented and
    never updated — fine-tune/eval flows should import stats or opt into live
    mode.

    ``live=True`` (``train_batch_stats`` model knob): running stats live in
    the mutable ``batch_stats`` collection (f32) and are updated during train
    with torch momentum semantics — ``running = (1-m)*running + m*batch``,
    with the UNBIASED batch variance feeding the running var while the biased
    variance normalizes the batch (exact torch.nn.BatchNorm2d formula). Eval
    normalizes with the tracked stats. The trainers thread ``batch_stats``
    through the jitted steps when present (TrainState.batch_stats).
    """

    eps: float = 1e-5
    momentum: float = 0.1
    live: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if not self.live:
            r_mean = jax.lax.stop_gradient(self.param("mean", nn.initializers.zeros, (c,)))
            r_var = jax.lax.stop_gradient(self.param("var", nn.initializers.ones, (c,)))
            if train:
                axes = tuple(range(x.ndim - 1))
                mean = x.mean(axes)
                var = x.var(axes)
            else:
                mean, var = r_mean, r_var
            y = (x - mean) / jnp.sqrt(var + self.eps)
            return y * scale + bias

        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = x.mean(axes)
            var = x.var(axes)
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                n = x.size / c
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * jax.lax.stop_gradient(
                    mean.astype(jnp.float32)
                )
                ra_var.value = (1.0 - m) * ra_var.value + m * jax.lax.stop_gradient(
                    unbiased.astype(jnp.float32)
                )
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * scale + bias


def nearest_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize of an NHWC array with torch
    ``F.interpolate(mode="nearest")`` index semantics (floor(i * in / out))."""
    import numpy as np

    _, in_h, in_w, _ = x.shape
    ys = np.floor(np.arange(out_h) * (in_h / out_h)).astype(np.int32)
    xs = np.floor(np.arange(out_w) * (in_w / out_w)).astype(np.int32)
    return x[:, ys][:, :, xs]


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of an NHWC array with half-pixel centers and NO
    antialiasing — exact torch ``F.interpolate(mode="bilinear",
    align_corners=False)`` semantics (jax.image.resize antialiases on
    downsampling, which the reference does not). Static gathers, XLA-friendly.
    """
    _, in_h, in_w, _ = x.shape

    def axis_weights(n_in, n_out):
        import numpy as np

        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        i0 = np.floor(src).astype(np.int32)
        w1 = (src - i0).astype(np.float32)
        i0c = np.clip(i0, 0, n_in - 1)
        i1c = np.clip(i0 + 1, 0, n_in - 1)
        return i0c, i1c, w1

    y0, y1, wy = axis_weights(in_h, out_h)
    x0, x1, wx = axis_weights(in_w, out_w)
    wy = jnp.asarray(wy)[None, :, None, None]
    wx = jnp.asarray(wx)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


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
    """Per-channel, per-sample normalization over the spatial axes (torch
    InstanceNorm2d/3d, affine=False, eps=1e-5). Channels-last: normalizes
    over every axis except batch (first) and channels (last)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(1, x.ndim - 1))
        # stats in f32 regardless of the compute dtype (bf16 mean/var over
        # 100k spatial elements is too coarse); output follows the input dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=axes, keepdims=True)
        var = xf.var(axis=axes, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


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
    lane_fold: bool = False  # folded layout in/out; Conv handles all padding

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.dilation * (self.kernel_size - 1) // 2
        if pad and not self.lane_fold:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        x = Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
            lane_fold=self.lane_fold,
            fold_pad_mode="edge",
        )(x)
        if self.nonlinear is None or self.nonlinear.lower() == "none":
            return x
        if self.nonlinear.lower() == "relu":
            return nn.relu(x)
        if self.nonlinear.lower() == "leakyrelu":
            return nn.leaky_relu(x, 0.01)
        raise ValueError(f"Unknown nonlinearity {self.nonlinear!r}")
