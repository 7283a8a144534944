"""Recurrent Variational Network (RVN).

Functional parity with reference:
mridc/collections/reconstruction/nn/recurrentvarnet/recurrentvarnet.py
(``RecurrentInit`` :17, ``RecurrentVarNetBlock`` :100), conv2gru.py:13
(``Conv2dGRU``), nn/rvn.py:20: k-space refinement steps, each = learned-rate
gradient DC + a multi-layer conv-GRU regularizer whose hidden state is
initialized from the (sense/zero-filled) input by a dilated conv stack.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.ops.cplx import ccombine, cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["Conv2dGRU", "RecurrentInit", "RecurrentVarNet"]


class Conv2dGRU(nn.Module):
    """Multi-layer convolutional GRU (reference conv2gru.py:13-190)."""

    hidden_channels: int = 64
    out_channels: int = 2
    num_layers: int = 4
    gru_kernel_size: int = 1
    dtype: str = None  # opt-in bf16 conv compute; params stay f32, the GRU
    # state is carried in the compute dtype, the output is cast back to f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: Optional[jnp.ndarray]):
        """x [B, H, W, C]; state [B, H, W, hidden, num_layers] or None."""
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        b, h, w, _ = x.shape
        if state is None:
            state = jnp.zeros((b, h, w, self.hidden_channels, self.num_layers), x.dtype)
        else:
            state = state.astype(x.dtype)
        new_states = []
        cell = x
        for idx in range(self.num_layers):
            k = 5 if idx == 0 else 3
            d = 2 if idx == 1 else 1
            pad = d * (k - 1) // 2
            padded = jnp.pad(cell, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
            cell = nn.relu(
                nn.Conv(self.hidden_channels, (k, k), kernel_dilation=(d, d), padding="VALID",
                        dtype=self.dtype)(padded)
            )
            prev = state[..., idx]
            stacked = jnp.concatenate([cell, prev], axis=-1)
            gconv = lambda: nn.Conv(  # noqa: E731
                self.hidden_channels,
                (self.gru_kernel_size, self.gru_kernel_size),
                padding="SAME",
                kernel_init=nn.initializers.orthogonal(),
                dtype=self.dtype,
            )
            update = nn.sigmoid(gconv()(stacked))
            reset = nn.sigmoid(gconv()(stacked))
            delta = jnp.tanh(gconv()(jnp.concatenate([cell, prev * reset], axis=-1)))
            cell = prev * (1 - update) + delta * update
            new_states.append(cell)
            cell = nn.relu(cell)
        pad = 1
        padded = jnp.pad(cell, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        out = nn.Conv(self.out_channels, (3, 3), padding="VALID", dtype=self.dtype)(padded)
        return out.astype(in_dtype), jnp.stack(new_states, axis=-1)


class RecurrentInit(nn.Module):
    """Recurrent state initializer (reference recurrentvarnet.py:17-95)."""

    out_channels: int
    channels: Sequence[int] = (32, 32, 64, 64)
    dilations: Sequence[int] = (1, 1, 2, 4)
    depth: int = 4
    multiscale_depth: int = 1
    dtype: str = None  # opt-in bf16 conv compute (the produced hidden state
    # stays in the compute dtype to match Conv2dGRU's carry)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        features = []
        for ch, dil in zip(self.channels, self.dilations):
            pad = dil
            padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
            x = nn.relu(nn.Conv(ch, (3, 3), kernel_dilation=(dil, dil), padding="VALID", dtype=self.dtype)(padded))
            if self.multiscale_depth > 1:
                features.append(x)
        if self.multiscale_depth > 1:
            x = jnp.concatenate(features[-self.multiscale_depth :], axis=-1)
        outs = [nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)) for _ in range(self.depth)]
        return jnp.stack(outs, axis=-1)


class _RVNBlock(BaseReconModel):
    in_channels: int = 2
    hidden_channels: int = 64
    num_layers: int = 4
    compute_dtype: str = None

    @nn.compact
    def __call__(self, current_kspace, masked_kspace, mask, sens, hidden):
        lr = self.param("learning_rate", nn.initializers.ones, (1,))
        m = mask[..., None] if mask.ndim == current_kspace.ndim - 1 else mask
        dc = m * (current_kspace - masked_kspace)
        # regularizer operates on the SENSE-combined image
        img = cmul_conj(
            ifft2_rv(current_kspace, self.fft_centered, self.fft_normalization, self.spatial_dims), sens
        ).sum(axis=self.coil_dim)
        reg, hidden = Conv2dGRU(
            hidden_channels=self.hidden_channels, out_channels=self.in_channels,
            num_layers=self.num_layers, dtype=self.compute_dtype,
        )(img, hidden)
        reg_k = fft2_rv(cmul(reg[:, None], sens), self.fft_centered, self.fft_normalization, self.spatial_dims)
        return current_kspace - lr * dc + reg_k, hidden


class RecurrentVarNet(BaseReconModel):
    in_channels: int = 2
    recurrent_hidden_channels: int = 64
    recurrent_num_layers: int = 4
    num_steps: int = 8
    no_parameter_sharing: bool = True
    learned_initializer: bool = True
    initializer_initialization: str = "sense"
    initializer_channels: Sequence[int] = (32, 32, 64, 64)
    initializer_dilations: Sequence[int] = (1, 1, 2, 4)
    initializer_multiscale: int = 1
    compute_dtype: str = None  # opt-in bf16 compute for the GRU regularizer
    # and the state initializer; the DC/FFT chain stays f32, params stay f32

    @classmethod
    def from_config(cls, cfg):
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            in_channels=cfg.get("in_channels", 2),
            recurrent_hidden_channels=cfg.get("recurrent_hidden_channels", 64),
            recurrent_num_layers=cfg.get("recurrent_num_layers", 4),
            num_steps=8 * math.ceil(cfg.get("num_steps", 8) / 8),
            no_parameter_sharing=cfg.get("no_parameter_sharing", True),
            learned_initializer=cfg.get("learned_initializer", True),
            initializer_initialization=cfg.get("initializer_initialization", "sense"),
            initializer_channels=tuple(cfg.get("initializer_channels", (32, 32, 64, 64))),
            initializer_dilations=tuple(cfg.get("initializer_dilations", (1, 1, 2, 4))),
            initializer_multiscale=cfg.get("initializer_multiscale", 1),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del train
        mask = expand_mask(mask)
        hidden = None
        if self.learned_initializer:
            if self.initializer_initialization == "sense":
                init_img = cmul_conj(
                    ifft2_rv(y, self.fft_centered, self.fft_normalization, self.spatial_dims), sens
                ).sum(axis=self.coil_dim, keepdims=True)
            elif self.initializer_initialization == "input_image" and init_pred is not None:
                init_img = init_pred[:, None]
            else:  # zero_filled
                init_img = ifft2_rv(y, self.fft_centered, self.fft_normalization, self.spatial_dims)
            init_k = fft2_rv(init_img, self.fft_centered, self.fft_normalization, self.spatial_dims).sum(1)
            hidden = RecurrentInit(
                self.recurrent_hidden_channels,
                channels=self.initializer_channels,
                dilations=self.initializer_dilations,
                depth=self.recurrent_num_layers,
                multiscale_depth=self.initializer_multiscale,
                dtype=self.compute_dtype,
            )(init_k)

        kspace = y
        n_blocks = self.num_steps if self.no_parameter_sharing else 1
        blocks = [
            _RVNBlock(
                in_channels=self.in_channels,
                hidden_channels=self.recurrent_hidden_channels,
                num_layers=self.recurrent_num_layers,
                compute_dtype=self.compute_dtype,
                fft_centered=self.fft_centered,
                fft_normalization=self.fft_normalization,
                spatial_dims=self.spatial_dims,
                coil_dim=self.coil_dim,
            )
            for _ in range(n_blocks)
        ]
        for step in range(self.num_steps):
            block = blocks[step] if self.no_parameter_sharing else blocks[0]
            kspace, hidden = block(kspace, y, mask, sens, hidden)

        image = ifft2_rv(kspace, self.fft_centered, self.fft_normalization, self.spatial_dims)
        prediction = ccombine(image, sens, self.coil_combination_method, self.coil_dim)
        return ModelOutput(prediction=prediction)
