"""use_sens_net integration: estimate coil sensitivities before reconstruction.

Functional parity with reference:
mridc/collections/reconstruction/nn/base.py:406 (``if self.use_sens_net:
sensitivity_maps = self.sens_net(kspace, mask)``) — here as a wrapper module so
the trainer stays model-agnostic.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from mridc_tpu.models.base import ModelOutput
from mridc_tpu.nn.sens import SensitivityModel

__all__ = ["WithSensNet", "maybe_wrap_sens_net"]


class WithSensNet(nn.Module):
    """Runs a SensitivityModel on the masked k-space, feeds the estimated maps
    to the wrapped reconstruction model (ignoring the dataset-provided maps)."""

    model: Any
    sens_chans: int = 8
    sens_pools: int = 4
    sens_mask_type: str = "2D"
    sens_normalize: bool = True
    sens_mask_center: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del sens  # estimated below
        est = SensitivityModel(
            chans=self.sens_chans,
            num_pools=self.sens_pools,
            mask_type=self.sens_mask_type,
            fft_centered=self.model.fft_centered,
            fft_normalization=self.model.fft_normalization,
            spatial_dims=self.model.spatial_dims,
            coil_dim=self.model.coil_dim,
            normalize=self.sens_normalize,
            mask_center=self.sens_mask_center,
            dtype=self.compute_dtype,
        )(y, mask, train=train)
        return self.model(y, est, mask, init_pred, train=train)


_SENS_UNSUPPORTED = {
    # models whose call contract is not (y, sens, mask, init_pred):
    # quantitative ((y, sens, sampling_mask, maps_init, tes) over 6D echo
    # k-space) and segmentation ((image,)) — the reference's use_sens_net for
    # those families lives inside the model bases, not a recon-style wrapper
    "QCIRIM", "QRIM", "QVN", "QVARNET",
    "SEGMENTATIONUNET", "SEGMENTATION2DUNET", "SEGMENTATION3DUNET",
    "SEGMENTATIONATTENTIONUNET", "SEGMENTATIONLAMBDAUNET", "SEGMENTATIONVNET",
    "SEGMENTATIONDYNUNET", "SEGMENTATIONUNETR",
}


def maybe_wrap_sens_net(model, cfg, model_name: str = "") -> Any:
    """Wrap when the config sets ``use_sens_net`` (reference cfg keys
    sens_chans/sens_pools/sens_mask_type)."""
    if not cfg.get("use_sens_net", False):
        return model
    if str(model_name).upper() in _SENS_UNSUPPORTED:
        raise ValueError(
            f"use_sens_net is not supported for {model_name}: the sens-net wrapper "
            "assumes the reconstruction call contract (y, sens, mask, init_pred) "
            "over [B, C, H, W, 2] k-space"
        )
    return WithSensNet(
        model=model,
        sens_chans=cfg.get("sens_chans", 8),
        sens_pools=cfg.get("sens_pools", 4),
        sens_mask_type=cfg.get("sens_mask_type", "2D"),
        sens_normalize=cfg.get("sens_normalize", True),
        sens_mask_center=cfg.get("sens_mask_center", True),
        compute_dtype=cfg.get("compute_dtype", None),
    )
