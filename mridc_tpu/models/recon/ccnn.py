"""CascadeNet (CCNN) (reference: mridc/collections/reconstruction/nn/ccnn.py:19,
cascadenet/ccnn_block.py:11, conv/conv2d.py)."""

from __future__ import annotations

import flax.linen as nn

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.conv2d import Conv2dCascade
from mridc_tpu.nn.dc import sens_expand, sens_reduce, soft_dc
from mridc_tpu.ops.cplx import ccombine
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["CascadeNet"]


class CascadeNet(BaseReconModel):
    num_cascades: int = 10
    hidden_channels: int = 64
    n_convs: int = 5
    batchnorm: bool = False
    live_bn: bool = False
    no_dc: bool = False
    compute_dtype: str = None  # opt-in bf16 conv compute (DC/FFT stay f32)

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_cascades=cfg.get("num_cascades", 10),
            hidden_channels=cfg.get("hidden_channels", 64),
            n_convs=cfg.get("n_convs", 5),
            batchnorm=cfg.get("batchnorm", False),
            live_bn=bool(cfg.get("train_batch_stats", False)),
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
        del init_pred
        mask = expand_mask(mask)
        pred = y
        for i in range(self.num_cascades):
            dc_weight = self.param(f"dc_weight_{i}", nn.initializers.ones, (1,))
            dc = soft_dc(pred, y, mask, dc_weight)
            image = sens_reduce(
                pred, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
            )
            x = Conv2dCascade(
                out_channels=2, hidden_channels=self.hidden_channels, n_convs=self.n_convs,
                batchnorm=self.batchnorm, live_bn=self.live_bn, dtype=self.compute_dtype,
            )(image, train)
            model_term = sens_expand(
                x, sens, self.fft_centered, self.fft_normalization, self.spatial_dims
            )
            pred = model_term if self.no_dc else pred - dc - model_term
        image = ifft2_rv(pred, self.fft_centered, self.fft_normalization, self.spatial_dims)
        prediction = ccombine(image, sens, self.coil_combination_method, self.coil_dim)
        return ModelOutput(prediction=prediction)
