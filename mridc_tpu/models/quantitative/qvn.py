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
from mridc_tpu.models.quantitative.signal_model import fit_megre_maps, megre_signal
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
    use_reconstruction_module: bool = False
    recon_num_cascades: int = 8
    recon_channels: int = 18
    recon_pooling_layers: int = 4
    recon_no_dc: bool = False

    @classmethod
    def from_config(cls, cfg):
        g = lambda k, d: cfg.get(f"quantitative_module_{k}", d)  # noqa: E731
        r = lambda k, d: cfg.get(f"reconstruction_module_{k}", d)  # noqa: E731
        return cls(
            use_reconstruction_module=bool(cfg.get("use_reconstruction_module", False)),
            recon_num_cascades=r("num_cascades", 8),
            recon_channels=r("channels", 18),
            recon_pooling_layers=r("pooling_layers", 4),
            recon_no_dc=bool(r("no_dc", False)),
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

        if self.use_reconstruction_module:
            # reference qvn.py:145-175: per-echo E2E-VarNet cascades over the
            # echo's k-space, then replace y with the expanded reconstructions
            # and re-initialize the maps (jittable fit — see PARITY.md).
            from mridc_tpu.models.recon.vn import _VarNetBlock
            from mridc_tpu.nn.dc import sens_reduce as _sens_reduce

            mask4 = sampling_mask if sampling_mask.ndim == 4 else sampling_mask[:, 0, 0, :, :, 0][:, None]
            maskb = mask4[..., None]  # broadcast against [B, C, H, W, 2]
            echo_preds = []
            blocks = [
                _VarNetBlock(
                    channels=self.recon_channels,
                    pooling_layers=self.recon_pooling_layers,
                    no_dc=self.recon_no_dc,
                    fft_centered=self.fft_centered,
                    fft_normalization=self.fft_normalization,
                    spatial_dims=self.spatial_dims,
                    coil_dim=1,
                )
                for _ in range(self.recon_num_cascades)
            ]
            for e in range(y.shape[1]):
                pred = y[:, e]
                for block in blocks:
                    pred = block(pred, y[:, e], sens, maskb, train)
                echo_preds.append(
                    _sens_reduce(pred, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, 1)
                )
            pred_img = jnp.stack(echo_preds, axis=1)  # [B, E, H, W, 2]
            y = fft2_rv(
                cmul(pred_img[:, :, None], sens[:, None]),
                self.fft_centered,
                self.fft_normalization,
                self.spatial_dims,
            )
            maps_init = fit_megre_maps(pred_img, tes)

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
