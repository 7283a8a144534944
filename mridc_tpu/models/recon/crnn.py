"""Convolutional Recurrent Net (CRNN) (reference:
mridc/collections/reconstruction/nn/crnn.py:21, convrecnet/crnn_block.py:33).

The reference iterates a shared conv regularizer + soft DC ``num_iterations``
times and losses every intermediate; here the iteration is a `lax.scan` via
`nn.scan` (shared weights), emitting stacked intermediates.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.conv2d import Conv2dCascade
from mridc_tpu.nn.dc import sens_expand, sens_reduce, soft_dc
from mridc_tpu.ops.cplx import ccombine
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["CRNNet"]


class _CRNNIter(BaseReconModel):
    hidden_channels: int = 64
    n_convs: int = 3
    batchnorm: bool = False
    no_dc: bool = False
    compute_dtype: str = None

    @nn.compact
    def __call__(self, carry, _, ref_kspace, sens, mask):
        pred = carry
        dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))
        dc = soft_dc(pred, ref_kspace, mask, dc_weight)
        image = sens_reduce(
            pred, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
        )
        x = Conv2dCascade(
            out_channels=2, hidden_channels=self.hidden_channels, n_convs=self.n_convs,
            batchnorm=self.batchnorm, dtype=self.compute_dtype,
        )(image)
        reg = x + image  # residual connection (reference :158)
        model_term = sens_expand(reg, sens, self.fft_centered, self.fft_normalization, self.spatial_dims)
        pred = model_term if self.no_dc else pred - dc - model_term
        return pred, pred


class CRNNet(BaseReconModel):
    num_iterations: int = 10
    hidden_channels: int = 64
    n_convs: int = 3
    batchnorm: bool = False
    no_dc: bool = False
    compute_dtype: str = None  # opt-in bf16 conv compute (DC/FFT stay f32)

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_iterations=cfg.get("num_iterations", 10),
            hidden_channels=cfg.get("hidden_channels", 64),
            n_convs=cfg.get("n_convs", 3),
            batchnorm=cfg.get("batchnorm", False),
            no_dc=cfg.get("no_dc", False),
            compute_dtype=cfg.get("compute_dtype"),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        scan = nn.scan(
            _CRNNIter,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=self.num_iterations,
        )(
            hidden_channels=self.hidden_channels,
            n_convs=self.n_convs,
            batchnorm=self.batchnorm,
            no_dc=self.no_dc,
            compute_dtype=self.compute_dtype,
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            spatial_dims=self.spatial_dims,
            coil_dim=self.coil_dim,
        )
        _, preds_k = scan(y, None, y, sens, mask)  # [T, B, C, H, W, 2] k-space
        images = ifft2_rv(preds_k, self.fft_centered, self.fft_normalization, self.spatial_dims)
        # coil combine each intermediate (coil axis shifts by the leading T axis)
        combined = ccombine(images, sens[None], self.coil_combination_method, self.coil_dim + 1)
        return ModelOutput(prediction=combined[-1], intermediates=combined)
