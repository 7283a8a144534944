"""MultiDomainNet: per-coil multi-domain UNet over standardized coil images.

Functional parity with reference:
mridc/collections/reconstruction/nn/multidomainnet.py:18 — ifft to coil images,
StandardizationLayer pairs, MultiDomainUnet2d per coil, SENSE combine.
"""

from __future__ import annotations

import flax.linen as nn

from mridc_tpu.models.base import BaseReconModel, ModelOutput
from mridc_tpu.nn.multidomain import MultiDomainUnet2d, StandardizationLayer
from mridc_tpu.ops.cplx import ccombine
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["MultiDomainNet"]


class MultiDomainNet(BaseReconModel):
    standardization: bool = True
    num_filters: int = 16
    num_pool_layers: int = 2
    compute_dtype: str = None  # opt-in bf16 conv compute (feature FFTs f32)

    @classmethod
    def from_config(cls, cfg):
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            standardization=cfg.get("standardization", True),
            num_filters=cfg.get("num_filters", 16),
            num_pool_layers=cfg.get("num_pool_layers", 2),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del mask, init_pred
        image = ifft2_rv(y, self.fft_centered, self.fft_normalization, self.spatial_dims)
        if self.standardization:
            image = StandardizationLayer(self.coil_dim)(image, sens)  # [B, C, H, W, 4]
        unet = MultiDomainUnet2d(
            out_channels=2,
            chans=self.num_filters,
            num_pool_layers=self.num_pool_layers,
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            dtype=self.compute_dtype,
        )
        b, c, h, w, ch = image.shape
        pred = unet(image.reshape(b * c, h, w, ch), train).reshape(b, c, h, w, 2)
        prediction = ccombine(pred, sens, self.coil_combination_method, self.coil_dim)
        return ModelOutput(prediction=prediction)
