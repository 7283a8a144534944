"""End-to-end Variational Network (reference: mridc/collections/reconstruction/nn/vn.py:19,
varnet/vn_block.py:11).

Cascades of (soft DC + NormUnet regularizer) in k-space. Cascades have
independent weights and run as a python loop of blocks (static count), each
block = sens_reduce -> NormUnet -> sens_expand with a learned DC weight.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.dc import sens_expand, sens_reduce, soft_dc
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import ccombine
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["VarNet"]


class _VarNetBlock(BaseReconModel):
    channels: int = 18
    pooling_layers: int = 4
    padding_size: int = 11
    normalize: bool = True
    no_dc: bool = False
    compute_dtype: str = None  # NormUnet conv compute dtype (bf16: params
    # stay f32, norm stats f32; the DC/FFT chain stays f32)

    @nn.compact
    def __call__(self, pred, ref_kspace, sens, mask, train: bool = False):
        dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))
        dc = soft_dc(pred, ref_kspace, mask, dc_weight)
        x = sens_reduce(
            pred, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
        )
        x = NormUnet(
            chans=self.channels,
            num_pools=self.pooling_layers,
            padding_size=self.padding_size,
            normalize=self.normalize,
            dtype=self.compute_dtype,
        )(x, train)
        model_term = sens_expand(
            x, sens, self.fft_centered, self.fft_normalization, self.spatial_dims
        )
        if self.no_dc:
            return model_term
        return pred - dc - model_term


class VarNet(BaseReconModel):
    num_cascades: int = 8
    channels: int = 18
    pooling_layers: int = 4
    padding_size: int = 11
    normalize: bool = True
    no_dc: bool = False
    compute_dtype: str = None

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_cascades=cfg.get("num_cascades", 8),
            channels=cfg.get("channels", 18),
            pooling_layers=cfg.get("pooling_layers", 4),
            padding_size=cfg.get("padding_size", 11),
            normalize=cfg.get("normalize", True),
            no_dc=cfg.get("no_dc", False),
            compute_dtype=cfg.get("compute_dtype", None),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred
        mask = expand_mask(mask)
        pred = y
        for _ in range(self.num_cascades):
            pred = _VarNetBlock(
                channels=self.channels,
                pooling_layers=self.pooling_layers,
                padding_size=self.padding_size,
                normalize=self.normalize,
                no_dc=self.no_dc,
                compute_dtype=self.compute_dtype,
                fft_centered=self.fft_centered,
                fft_normalization=self.fft_normalization,
                spatial_dims=self.spatial_dims,
                coil_dim=self.coil_dim,
            )(pred, y, sens, mask, train)
        image = ifft2_rv(pred, self.fft_centered, self.fft_normalization, self.spatial_dims)
        prediction = ccombine(image, sens, self.coil_combination_method, self.coil_dim)
        return ModelOutput(prediction=prediction)
