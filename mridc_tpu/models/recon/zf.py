"""Zero-filled reconstruction (reference: mridc/collections/reconstruction/nn/zf.py:17)."""

from __future__ import annotations

import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask

__all__ = ["ZF"]


class ZF(BaseReconModel):
    """ifft2 + SENSE/RSS coil combination; no parameters."""

    @classmethod
    def from_config(cls, cfg):
        return cls(
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del mask, init_pred, train
        pred = self.zero_filled(y, sens)
        return ModelOutput(prediction=pred)
