"""Variable-Splitting Network (VSNet).

Functional parity with reference:
mridc/collections/reconstruction/nn/vsnet.py:21 and
variablesplittingnet/vsnet_block.py (``DataConsistencyLayer`` — weighted
replace-DC, ``WeightedAverageTerm`` :27, ``VSNetBlock`` :39): per cascade,
denoise the SENSE image, expand, weighted-replace DC, reduce, weighted average.
"""

from __future__ import annotations

import flax.linen as nn

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.conv2d import Conv2dCascade
from mridc_tpu.nn.dc import sens_expand, sens_reduce
from mridc_tpu.nn.mwcnn import MWCNN
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import ccombine
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["VSNet"]


class VSNet(BaseReconModel):
    num_cascades: int = 10
    image_arch: str = "CONV"
    cfg: dict = None

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_cascades=cfg.get("num_cascades", 10),
            image_arch=str(cfg.get("imspace_model_architecture", "CONV")).upper(),
            cfg=dict(cfg),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def _denoiser(self):
        cfg = self.cfg or {}
        if self.image_arch == "MWCNN":
            return MWCNN(
                input_channels=2,
                first_conv_hidden_channels=cfg.get("image_mwcnn_hidden_channels", 16),
                num_scales=cfg.get("image_mwcnn_num_scales", 2),
                dtype=cfg.get("compute_dtype"),
            )
        if self.image_arch in ("UNET", "NORMUNET"):
            return NormUnet(
                cfg.get("imspace_unet_num_filters", 16),
                cfg.get("imspace_unet_num_pool_layers", 2),
                padding_size=cfg.get("imspace_unet_padding_size", 11),
                normalize=cfg.get("imspace_unet_normalize", True),
                dtype=cfg.get("compute_dtype"),
            )
        return Conv2dCascade(
            out_channels=2,
            hidden_channels=cfg.get("imspace_conv_hidden_channels", 16),
            n_convs=cfg.get("imspace_conv_n_convs", 4),
            batchnorm=cfg.get("imspace_conv_batchnorm", False),
            live_bn=bool(cfg.get("train_batch_stats", False)),
            dtype=cfg.get("compute_dtype"),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        m = mask[..., None]
        kspace = y
        for i in range(self.num_cascades):
            pred = sens_reduce(
                kspace, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
            )
            pred = self._denoiser()(pred)
            pred_k = sens_expand(pred, sens, self.fft_centered, self.fft_normalization, self.spatial_dims)
            dc_weight = self.param(f"dc_weight_{i}", nn.initializers.ones, (1,))
            sx_k = ((1 - m) * pred_k + m * y) * dc_weight
            sx = sens_reduce(
                sx_k, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
            )
            wa = self.param(f"weighted_avg_{i}", nn.initializers.ones, (1,))
            combined = wa * (
                sens_reduce(kspace, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim)
                + pred
            ) + (1 - wa) * sx
            kspace = sens_expand(combined, sens, self.fft_centered, self.fft_normalization, self.spatial_dims)
        image = ifft2_rv(kspace, self.fft_centered, self.fft_normalization, self.spatial_dims)
        prediction = ccombine(image, sens, self.coil_combination_method, self.coil_dim)
        return ModelOutput(prediction=prediction)
