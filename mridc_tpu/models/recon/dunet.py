"""Down-Up Net (DUNet / sigmanet) with selectable data-consistency layer.

Functional parity with reference: mridc/collections/reconstruction/nn/dunet.py:20,
sigmanet/dc_layers.py (``DataIDLayer`` :14, ``DataGDLayer`` :21,
``DataProxCGLayer`` :111, ``DataVSLayer`` :400) and
sigmanet/sensitivity_net.py:152 (``SensitivityNetwork``: num_iter x
(residual regularizer + DC)).

The PROX DC layer's custom-autograd CG is replaced by an unrolled
`lax.fori_loop` CG, differentiable by plain autodiff.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.models.recon.resnet import conjugate_gradient
from mridc_tpu.nn.dc import sens_expand, sens_reduce
from mridc_tpu.nn.didn import DIDN
from mridc_tpu.nn.unet import NormUnet

__all__ = ["DUNet"]


class DUNet(BaseReconModel):
    num_iter: int = 10
    reg_arch: str = "DIDN"
    data_consistency_term: str = "GD"  # ID / GD / PROX / VS
    data_consistency_lambda_init: float = 0.1
    data_consistency_iterations: int = 10
    cfg: dict = None

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_iter=cfg.get("num_iter", 10),
            reg_arch=str(cfg.get("reg_model_architecture", "DIDN")).upper(),
            data_consistency_term=str(cfg.get("data_consistency_term", "GD")).upper(),
            data_consistency_lambda_init=cfg.get("data_consistency_lambda_init", 0.1),
            data_consistency_iterations=cfg.get("data_consistency_iterations", 10),
            cfg=dict(cfg),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def _reg(self):
        cfg = self.cfg or {}
        if self.reg_arch == "DIDN":
            return DIDN(
                out_channels=2,
                hidden_channels=cfg.get("didn_hidden_channels", 64),
                num_dubs=cfg.get("didn_num_dubs", 2),
                num_convs_recon=cfg.get("didn_num_convs_recon", 3),
                dtype=cfg.get("compute_dtype"),
            )
        return NormUnet(
            cfg.get("unet_num_filters", 16),
            cfg.get("unet_num_pool_layers", 2),
            padding_size=cfg.get("unet_padding_size", 11),
            normalize=cfg.get("unet_normalize", True),
            dtype=cfg.get("compute_dtype"),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del train
        mask = expand_mask(mask)
        m = mask[..., None]
        x = (
            init_pred
            if init_pred is not None and init_pred.ndim >= 4
            else self.sense_init(y, sens)
        )
        term = self.data_consistency_term
        for i in range(self.num_iter):
            x = x + self._reg()(x)
            if term == "GD":
                lam = self.param(f"lambda_{i}", nn.initializers.constant(self.data_consistency_lambda_init), (1,))
                ax = sens_expand(x, sens, self.fft_centered, self.fft_normalization, self.spatial_dims)
                grad = sens_reduce(
                    m * (ax - y), sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
                )
                x = x - lam * grad
            elif term == "PROX":
                lam = self.param(f"lambda_{i}", nn.initializers.constant(self.data_consistency_lambda_init), (1,))
                rhs = lam * sens_reduce(
                    m * y, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
                ) + x
                # solve (lam E^H E + I) u = rhs  <=>  conjugate_gradient with mu = 1/lam scaling
                x = conjugate_gradient(
                    rhs / jnp.maximum(lam, 1e-8),
                    sens,
                    mask,
                    1.0 / jnp.maximum(lam, 1e-8),
                    self.data_consistency_iterations,
                    self.fft_centered,
                    self.fft_normalization,
                    self.spatial_dims,
                    self.coil_dim,
                )
            elif term == "VS":
                alpha = self.param(f"alpha_{i}", nn.initializers.ones, (1,))
                beta = self.param(f"beta_{i}", nn.initializers.ones, (1,))
                ax = sens_expand(x, sens, self.fft_centered, self.fft_normalization, self.spatial_dims)
                k_dc = (1 - m) * ax + m * (alpha * ax + (1 - alpha) * y)
                x_dc = sens_reduce(
                    k_dc, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
                )
                x = beta * x + (1 - beta) * x_dc
            # ID: no data consistency
        return ModelOutput(prediction=x)
