"""Convolutional LSTM + ConvLSTM-fronted NormUnet (Flax, NHWC).

Functional parity with reference:
mridc/collections/multitask/rs/nn/seranet_base/convlstm.py:12 (``ConvLSTMCell``
— single 4-gate conv over [x, h]), :107 (``ConvLSTM`` — per-layer cells, zero
initial state, last-layer outputs) and convlstm_unet.py:13
(``ConvLSTMNormUnet`` — group-norm, pad-to-multiple, one ConvLSTM layer, then
the fastMRI U-Net).

TPU notes: time steps run under a static python loop (SERANet uses seq_len=1);
the 4-gate projection is a single fused conv so XLA keeps one MXU matmul per
step.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.nn.unet import Unet

__all__ = ["ConvLSTMCell", "ConvLSTM", "ConvLSTMNormUnet"]


class ConvLSTMCell(nn.Module):
    """One ConvLSTM step: gates = Conv([x, h]); i,f,o sigmoid; g tanh
    (reference convlstm.py:49-82, gate order i,f,o,g)."""

    hidden_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: str = None  # conv compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, state: Tuple[jnp.ndarray, jnp.ndarray]):
        h, c = state
        combined = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(
            4 * self.hidden_dim,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(combined)
        cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(cc_i)
        f = nn.sigmoid(cc_f)
        o = nn.sigmoid(cc_o)
        g = nn.tanh(cc_g)
        c_next = f * c + i * g
        h_next = o * nn.tanh(c_next)
        return h_next, c_next


class ConvLSTM(nn.Module):
    """Multi-layer ConvLSTM over a [B, T, H, W, C] sequence from zero state,
    returning the last layer's [B, T, H, W, hidden] outputs (reference
    convlstm.py:107, return_all_layers=False)."""

    hidden_dim: int
    kernel_size: int = 3
    num_layers: int = 1
    use_bias: bool = True
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        b, t, hgt, wdt, _ = x.shape
        seq = x
        for _ in range(self.num_layers):
            cell = ConvLSTMCell(self.hidden_dim, self.kernel_size, self.use_bias, dtype=self.dtype)
            h = jnp.zeros((b, hgt, wdt, self.hidden_dim), x.dtype)
            c = jnp.zeros_like(h)
            outs = []
            for step in range(t):
                h, c = cell(seq[:, step], (h, c))
                outs.append(h)
            seq = jnp.stack(outs, axis=1)
        return seq


class ConvLSTMNormUnet(nn.Module):
    """NormUnet with a single-layer ConvLSTM input stage (reference
    convlstm_unet.py:13): group-norm -> pad to multiple of padding_size+1 ->
    one zero-state ConvLSTM step -> U-Net -> unpad -> unnorm.

    Input/output: [B, H, W, C] real channels (callers channelize real views).
    """

    chans: int
    num_pools: int
    in_chans: int = 2
    out_chans: int = 2
    drop_prob: float = 0.0
    padding_size: int = 15
    normalize: bool = True
    norm_groups: int = 2
    dtype: str = None  # opt-in bf16 compute for the ConvLSTM stage and the
    # wrapped UNet; norm/unnorm and their stats stay f32

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

    def _pad(self, x):
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
        x = ConvLSTM(self.chans, kernel_size=3, num_layers=1, dtype=self.dtype)(x[:, None])[:, 0]
        # Unet returns f32 on both dtype paths (nn/unet.py)
        x = Unet(self.out_chans, self.chans, self.num_pools, self.drop_prob, dtype=self.dtype)(x, train)
        x = self._unpad(x, *pads)
        if self.normalize:
            x = self._unnorm(x, mean, std)
        return x
