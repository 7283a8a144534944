"""Convolutional recurrent cells for RIM-family models (Flax, NHWC).

Functional parity with reference:
mridc/collections/reconstruction/nn/rim/rnn_cells.py (``ConvGRUCell`` :115,
``ConvMGUCell`` :280, ``IndRNNCell`` :448): input-to-hidden conv carries bias,
hidden-to-hidden conv is bias-free; GRU uses r/z/n gate order with
``h' = n*(1-z) + z*h``; MGU uses ``h' = c + f*(h-c)``; IndRNN uses a
per-channel scalar recurrence ``relu(Wx + u*h)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.nn.layers import Conv

__all__ = ["ConvGRUCell", "ConvMGUCell", "IndRNNCell", "make_cell"]


def _gate_conv(
    features: int, kernel_size: int, dilation: int, use_bias: bool, dtype=None, pointwise_matmul: bool = False
):
    return Conv(
        features,
        (kernel_size, kernel_size),
        kernel_dilation=(dilation, dilation),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=nn.initializers.orthogonal(),
        dtype=dtype,
        pointwise_matmul=pointwise_matmul,
    )


class ConvGRUCell(nn.Module):
    hidden_size: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: str = None
    pointwise_matmul: bool = False  # lower 1x1 convs to matmul (training win)

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        pm = self.pointwise_matmul
        ih = _gate_conv(3 * self.hidden_size, self.kernel_size, self.dilation, self.use_bias, self.dtype, pm)(x)
        hh = _gate_conv(3 * self.hidden_size, self.kernel_size, self.dilation, False, self.dtype, pm)(h)
        ih_r, ih_z, ih_n = jnp.split(ih, 3, axis=-1)
        hh_r, hh_z, hh_n = jnp.split(hh, 3, axis=-1)
        r = nn.sigmoid(ih_r + hh_r)
        z = nn.sigmoid(ih_z + hh_z)
        n = jnp.tanh(ih_n + r * hh_n)
        return n * (1 - z) + z * h


class ConvMGUCell(nn.Module):
    hidden_size: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: str = None
    pointwise_matmul: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        pm = self.pointwise_matmul
        ih = _gate_conv(2 * self.hidden_size, self.kernel_size, self.dilation, self.use_bias, self.dtype, pm)(x)
        hh = _gate_conv(2 * self.hidden_size, self.kernel_size, self.dilation, False, self.dtype, pm)(h)
        ih_f, ih_c = jnp.split(ih, 2, axis=-1)
        hh_f, hh_c = jnp.split(hh, 2, axis=-1)
        f = nn.sigmoid(ih_f + hh_f)
        c = jnp.tanh(ih_c + f * hh_c)
        return c + f * (h - c)


class IndRNNCell(nn.Module):
    hidden_size: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: str = None
    pointwise_matmul: bool = False
    lane_fold: bool = False  # folded layout in/out (see nn/fold.py); the
    # per-channel recurrence weight is tiled over the two column parities

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        std = 1.0 / (self.hidden_size * (1 + self.kernel_size**2))
        ih = Conv(
            self.hidden_size,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=nn.initializers.normal(stddev=std),
            dtype=self.dtype,
            pointwise_matmul=self.pointwise_matmul,
            lane_fold=self.lane_fold,
        )(x)
        hh = self.param("hh", nn.initializers.normal(stddev=std), (1, 1, 1, self.hidden_size))
        if self.dtype is not None:
            # without this, f32 hh * bf16 h promotes the whole [B, H, W, C]
            # preactivation to f32 — doubling its bytes and inserting
            # convert chains through forward AND backward (profiled on v5e)
            hh = hh.astype(self.dtype)
        if self.lane_fold:
            hh = jnp.tile(hh, (1, 1, 1, 2))
        return nn.relu(ih + hh * h)


_CELLS = {"GRU": ConvGRUCell, "MGU": ConvMGUCell, "INDRNN": IndRNNCell}


def make_cell(
    kind: str,
    hidden_size: int,
    kernel_size: int,
    dilation: int,
    use_bias: bool,
    dtype=None,
    pointwise_matmul: bool = False,
    lane_fold: bool = False,
):
    kind = kind.upper()
    if kind not in _CELLS:
        raise ValueError(f"Unknown recurrent layer {kind!r}; choose from {sorted(_CELLS)}")
    if lane_fold and kind != "INDRNN":
        raise ValueError("lane_fold is currently supported for the IndRNN cell only")
    kwargs = dict(
        hidden_size=hidden_size,
        kernel_size=kernel_size,
        dilation=dilation,
        use_bias=use_bias,
        dtype=dtype,
        pointwise_matmul=pointwise_matmul,
    )
    if kind == "INDRNN":
        kwargs["lane_fold"] = lane_fold
    return _CELLS[kind](**kwargs)
