"""Multi-level Wavelet CNN (image regularizer for XPDNet/KIKINet).

Functional parity with reference:
mridc/collections/reconstruction/nn/mwcnn/mwcnn.py (``DWT`` :14, ``IWT`` :57,
``ConvBlock``, ``DilatedConvBlock``, ``MWCNN`` :268): Haar-like DWT
downsampling (channel 4x), conv + dilated-conv blocks per scale, IWT upsampling
with residual skips.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["dwt2", "iwt2", "MWCNN"]


def dwt2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (reference DWT channel order LL,HL,LH,HH)."""
    x01 = x[:, 0::2] / 2
    x02 = x[:, 1::2] / 2
    x1 = x01[:, :, 0::2]
    x2 = x02[:, :, 0::2]
    x3 = x01[:, :, 1::2]
    x4 = x02[:, :, 1::2]
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def iwt2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 4C] -> [B, 2H, 2W, C]."""
    c = x.shape[-1] // 4
    x1, x2, x3, x4 = (x[..., i * c : (i + 1) * c] / 2 for i in range(4))
    b, h, w, _ = x1.shape
    out = jnp.zeros((b, 2 * h, 2 * w, c), x.dtype)
    out = out.at[:, 0::2, 0::2].set(x1 - x2 - x3 + x4)
    out = out.at[:, 1::2, 0::2].set(x1 - x2 + x3 - x4)
    out = out.at[:, 0::2, 1::2].set(x1 + x2 - x3 - x4)
    out = out.at[:, 1::2, 1::2].set(x1 + x2 + x3 + x4)
    return out


def _bn_f32(x, train, live: bool = False):
    """BatchNorm computed in f32 regardless of the compute dtype. Torch
    semantics via TorchBatchNorm (reference mwcnn.py:154: eps=1e-4,
    momentum=0.95 — torch momentum weights the NEW batch stat); live=True
    tracks running stats in the batch_stats collection
    (``train_batch_stats``), default keeps them frozen params."""
    from mridc_tpu.nn.layers import TorchBatchNorm

    out = TorchBatchNorm(eps=1e-4, momentum=0.95, live=live)(x.astype(jnp.float32), train)
    return out.astype(x.dtype)


class _CB(nn.Module):
    features: int
    batchnorm: bool = False
    live_bn: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        if self.batchnorm:
            x = _bn_f32(x, train, self.live_bn)
        return nn.relu(x)


class _DilCB(nn.Module):
    dilations: Tuple[int, int]
    batchnorm: bool = False
    live_bn: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        for d in self.dilations:
            x = nn.Conv(c, (3, 3), kernel_dilation=(d, d), padding="SAME", dtype=self.dtype)(x)
            if self.batchnorm:
                x = _bn_f32(x, train, self.live_bn)
            x = nn.relu(x)
        return x


class MWCNN(nn.Module):
    input_channels: int = 2
    first_conv_hidden_channels: int = 16
    num_scales: int = 4
    batchnorm: bool = False
    live_bn: bool = False
    dtype: str = None  # opt-in bf16 conv compute; params/BatchNorm stats stay
    # f32, the DWT/IWT ladders run in the compute dtype, output cast to f32

    @nn.compact
    def __call__(self, x, res: bool = False, train: bool = False):
        def pad_even(v):
            ph = v.shape[1] % 2
            pw = v.shape[2] % 2
            if ph or pw:
                v = jnp.pad(v, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            return v

        inp = x
        x = pad_even(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        res_values = []
        hc = self.first_conv_hidden_channels
        for idx in range(self.num_scales):
            dil = (2, 1) if idx != self.num_scales - 1 else (2, 3)
            feats = hc * 2**idx
            inp_x = x if idx == 0 else dwt2(x)
            x = _CB(feats, self.batchnorm, self.live_bn, self.dtype)(inp_x, train)
            x = _DilCB(dil, self.batchnorm, self.live_bn, self.dtype)(x, train)
            if idx != self.num_scales - 1:
                x = pad_even(x)
                res_values.append(x)
        for idx in range(self.num_scales):
            scale = self.num_scales - 1 - idx
            dil = (2, 1) if scale != self.num_scales - 1 else (3, 2)
            out_feats = self.input_channels if scale == 0 else hc * 2 ** (scale + 1)
            x = _DilCB(dil, self.batchnorm, self.live_bn, self.dtype)(x, train)
            if scale != 0:
                x = _CB(out_feats, self.batchnorm, self.live_bn, self.dtype)(x, train)
                x = iwt2(x)
                skip = res_values[scale - 1]
                x = x[:, : skip.shape[1], : skip.shape[2]] + skip
            else:
                # the reference's final ConvBlock also applies the activation
                # (mwcnn.py ConvBlock net = [conv, act]); mirror that exactly
                x = nn.relu(nn.Conv(self.input_channels, (3, 3), padding="SAME", dtype=self.dtype)(x))
                x = x[:, : inp.shape[1], : inp.shape[2]].astype(inp.dtype)
                if res:
                    x = x + inp
        return x
