"""UNet reconstruction baseline (reference: mridc/collections/reconstruction/nn/unet.py:18)."""

from __future__ import annotations

import flax.linen as nn

from mridc_tpu.models.base import BaseReconModel, ModelOutput
from mridc_tpu.nn.unet import NormUnet

__all__ = ["UNet"]


class UNet(BaseReconModel):
    """SENSE-combined zero-filled image -> NormUnet -> complex image."""

    channels: int = 64
    pooling_layers: int = 2
    padding_size: int = 11
    normalize: bool = True
    dropout: float = 0.0
    compute_dtype: str = None  # opt-in bf16 conv compute (params stay f32)

    @classmethod
    def from_config(cls, cfg):
        return cls(
            channels=cfg.get("channels", 64),
            pooling_layers=cfg.get("pooling_layers", 2),
            padding_size=cfg.get("padding_size", 11),
            normalize=cfg.get("normalize", True),
            dropout=cfg.get("dropout_probability", 0.0),
            compute_dtype=cfg.get("compute_dtype", None),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del mask, init_pred
        x = self.zero_filled(y, sens)  # [B, H, W, 2] real view
        x = NormUnet(
            chans=self.channels,
            num_pools=self.pooling_layers,
            padding_size=self.padding_size,
            normalize=self.normalize,
            drop_prob=self.dropout,
            dtype=self.compute_dtype,
        )(x, train)
        return ModelOutput(prediction=x)
