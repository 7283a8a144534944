"""Joint Deep Model-Based MR Image and Coil Sensitivity Reconstruction Network.

Functional parity with reference:
mridc/collections/reconstruction/nn/jointicnet.py:19 — alternating gradient
updates of the coil sensitivities (``update_C`` :82) and the image
(``update_X`` :160) with NormUnet regularizers in image space, k-space, and a
sensitivity UNet; per-iteration learned step sizes / regularization weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.sens import SensitivityModel
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import cabs2, cconj, cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["JointICNet"]


class JointICNet(BaseReconModel):
    num_iter: int = 2
    kspace_unet_num_filters: int = 16
    kspace_unet_num_pool_layers: int = 2
    imspace_unet_num_filters: int = 16
    imspace_unet_num_pool_layers: int = 2
    sens_unet_num_filters: int = 16
    sens_unet_num_pool_layers: int = 2
    padding_size: int = 11
    compute_dtype: str = None  # opt-in bf16 conv compute (params stay f32)

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_iter=cfg.get("num_iter", 2),
            compute_dtype=cfg.get("compute_dtype", None),
            kspace_unet_num_filters=cfg.get("kspace_unet_num_filters", 16),
            kspace_unet_num_pool_layers=cfg.get("kspace_unet_num_pool_layers", 2),
            imspace_unet_num_filters=cfg.get("imspace_unet_num_filters", 16),
            imspace_unet_num_pool_layers=cfg.get("imspace_unet_num_pool_layers", 2),
            sens_unet_num_filters=cfg.get("sens_unet_num_filters", 16),
            sens_unet_num_pool_layers=cfg.get("sens_unet_num_pool_layers", 2),
            padding_size=cfg.get("kspace_unet_padding_size", 11),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def _fft(self, x):
        return fft2_rv(x, self.fft_centered, self.fft_normalization, self.spatial_dims)

    def _ifft(self, x):
        return ifft2_rv(x, self.fft_centered, self.fft_normalization, self.spatial_dims)

    @nn.compact
    def __call__(self, y, sens_in, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del sens_in, init_pred
        mask = expand_mask(mask)
        m = mask[..., None]

        kspace_model = NormUnet(
            self.kspace_unet_num_filters, self.kspace_unet_num_pool_layers,
            padding_size=self.padding_size, dtype=self.compute_dtype,
        )
        image_model = NormUnet(
            self.imspace_unet_num_filters, self.imspace_unet_num_pool_layers,
            padding_size=self.padding_size, dtype=self.compute_dtype,
        )
        sens_net = SensitivityModel(
            chans=self.sens_unet_num_filters,
            num_pools=self.sens_unet_num_pool_layers,
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            spatial_dims=self.spatial_dims,
            coil_dim=self.coil_dim,
            dtype=self.compute_dtype,
        )

        reg_i = self.param("reg_param_I", nn.initializers.ones, (self.num_iter,))
        reg_f = self.param("reg_param_F", nn.initializers.ones, (self.num_iter,))
        reg_c = self.param("reg_param_C", nn.initializers.ones, (self.num_iter,))
        lr_image = self.param("lr_image", nn.initializers.ones, (self.num_iter,))
        lr_sens = self.param("lr_sens", nn.initializers.ones, (self.num_iter,))

        dc_sens = sens_net(y, mask, train=train)
        sens = dc_sens
        image = cmul_conj(self._ifft(y), sens).sum(axis=self.coil_dim)

        for idx in range(self.num_iter):
            # --- update C (reference :82-159; third term vanishes since the
            # residual is zero both on and off the sampled set, kept for parity)
            t1 = (1 - 2 * reg_c[idx] * lr_sens[idx]) * sens
            t2 = 2 * reg_c[idx] * lr_sens[idx] * dc_sens
            ax = self._fft(cmul(image[:, None], sens))
            ax = jnp.where(m == 0, jnp.zeros((), ax.dtype), ax)
            resid = jnp.where(m == 1, jnp.zeros((), ax.dtype), ax - y)
            # the reference multiplies the backward residual ELEMENTWISE with
            # the conjugated image real-view (jointicnet.py:147-149 uses `*`,
            # not complex_mul) and does NOT re-normalize the maps — mirrored
            t3 = 2 * lr_sens[idx] * (self._ifft(resid) * cconj(image)[:, None])
            sens = t1 + t2 - t3

            # --- update X (reference :160-238)
            x1 = (1 - 2 * reg_i[idx] * lr_image[idx] - 2 * reg_f[idx] * lr_image[idx]) * image
            di = image_model(image, train)
            df = self._ifft(kspace_model(self._fft(image), train))
            x2 = 2 * lr_image[idx] * (reg_i[idx] * di + reg_f[idx] * df)
            a = self._fft(cmul(image[:, None], sens))
            a = jnp.where(m == 0, jnp.zeros((), a.dtype), a) - y
            x3 = 2 * lr_image[idx] * cmul_conj(self._ifft(a), sens).sum(axis=self.coil_dim)
            image = x1 + x2 - x3

        return ModelOutput(prediction=image)
