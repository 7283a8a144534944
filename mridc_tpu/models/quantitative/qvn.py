"""qVarNet: variational network in quantitative-parameter space.

Functional parity with reference:
mridc/collections/quantitative/nn/qvn.py:23 and qvarnet/qvn_block.py:13 —
per cascade: forward-model the maps to echo signals, soft DC in k-space,
SENSE-reduce the DC residual, NormUnet over the 4-map stack, residual update,
clamp R2* >= 0.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput
from mridc_tpu.models.quantitative.signal_model import megre_signal
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["qVarNet"]


class qVarNet(BaseReconModel):
    num_cascades: int = 8
    channels: int = 18
    pooling_layers: int = 4
    padding_size: int = 11
    normalize: bool = True
    gamma: Sequence[float] = (150.0, 150.0, 600.0, 150.0)

    @classmethod
    def from_config(cls, cfg):
        g = lambda k, d: cfg.get(f"quantitative_module_{k}", d)  # noqa: E731
        return cls(
            num_cascades=g("num_cascades", 8),
            channels=g("channels", 18),
            pooling_layers=g("pooling_layers", 4),
            padding_size=g("padding_size", 11),
            normalize=g("normalize", True),
            gamma=tuple(g("gamma_regularization_factors", (150.0, 150.0, 600.0, 150.0))),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, sampling_mask, maps_init, tes, train: bool = False) -> ModelOutput:
        gamma = jnp.asarray(self.gamma, jnp.float32)
        maps = maps_init / gamma[None, None, None, :]
        if sampling_mask.ndim == 4:
            sampling_mask = sampling_mask[:, None, ..., None]
        sens_e = sens[:, None]
        for i in range(self.num_cascades):
            r2s = maps[..., 0] * gamma[0]
            s0 = maps[..., 1] * gamma[1]
            b0 = maps[..., 2] * gamma[2]
            phi = maps[..., 3] * gamma[3]
            pred = megre_signal(r2s, s0, b0, phi, tes)  # [B, E, H, W, 2]
            pred_k = fft2_rv(
                cmul(pred[:, :, None], sens_e), self.fft_centered, self.fft_normalization, self.spatial_dims
            )
            dc_weight = self.param(f"dc_weight_{i}", nn.initializers.ones, (1,))
            soft = (pred_k - y) * sampling_mask * dc_weight
            resid = cmul_conj(
                ifft2_rv(soft, self.fft_centered, self.fft_normalization, self.spatial_dims), sens_e
            ).sum(axis=2)  # [B, E, H, W, 2]
            # stack echo residuals into channels for the regularizer
            b, e, h, w, _ = resid.shape
            reg_in = resid.transpose(0, 2, 3, 1, 4).reshape(b, h, w, 2 * e)
            unet = NormUnet(
                self.channels,
                self.pooling_layers,
                out_chans=4,
                padding_size=self.padding_size,
                normalize=self.normalize,
            )
            maps = maps + unet(reg_in, train)
            maps = maps.at[..., 0].set(jnp.maximum(maps[..., 0], 0.0))
        final = maps * gamma[None, None, None, :]
        return ModelOutput(prediction=final)
