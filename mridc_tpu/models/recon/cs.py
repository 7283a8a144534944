"""CS and PICS models over the JAX FISTA solvers.

Functional parity with reference: mridc/collections/reconstruction/nn/cs.py:19
(sigpy L1Wavelet/TV apps) and nn/pics.py:29 (BART ``pics -R W``); both are
parameter-free iterative reconstructions, here running fully on-device.
"""

from __future__ import annotations

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.cs_solvers import fista_l1_wavelet, fista_tv

__all__ = ["CS", "PICS"]


class CS(BaseReconModel):
    cs_type: str = "l1_wavelet"  # or "total_variation"
    reg_wt: float = 0.005
    num_iters: int = 60

    @classmethod
    def from_config(cls, cfg):
        return cls(
            cs_type=cfg.get("cs_type", "l1_wavelet"),
            reg_wt=cfg.get("reg_wt", 0.005),
            num_iters=cfg.get("num_iters", 60),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        solver = fista_l1_wavelet if self.cs_type == "l1_wavelet" else fista_tv
        x = solver(
            y,
            sens,
            mask,
            reg_wt=self.reg_wt,
            num_iters=self.num_iters,
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            spatial_dims=self.spatial_dims,
            coil_dim=self.coil_dim,
        )
        return ModelOutput(prediction=x)


class PICS(BaseReconModel):
    """Parallel-imaging compressed sensing (BART `pics -R W` equivalent):
    l1-wavelet FISTA on the SENSE model."""

    reg_wt: float = 0.005
    num_iters: int = 60

    @classmethod
    def from_config(cls, cfg):
        return cls(
            reg_wt=cfg.get("reg_wt", 0.005),
            num_iters=cfg.get("num_iters", 60),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        x = fista_l1_wavelet(
            y,
            sens,
            mask,
            reg_wt=self.reg_wt,
            num_iters=self.num_iters,
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            spatial_dims=self.spatial_dims,
            coil_dim=self.coil_dim,
        )
        return ModelOutput(prediction=x)
