"""Learned Primal-Dual network.

Functional parity with reference: mridc/collections/reconstruction/nn/lpd.py:22
and primaldual/pd.py (``DualNet`` :10, ``PrimalNet`` :72): buffers of
``num_primal`` image copies and ``num_dual`` k-space copies; per iteration the
dual net refines k-space given the forward of primal slot 2, the primal net
refines images given the adjoint of dual slot 1. Output is |primal slot 1|.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.conv2d import Conv2dCascade
from mridc_tpu.nn.didn import DIDN
from mridc_tpu.nn.mwcnn import MWCNN
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["LPDNet"]


class LPDNet(BaseReconModel):
    num_iter: int = 2
    num_primal: int = 5
    num_dual: int = 5
    primal_arch: str = "UNET"
    dual_arch: str = "UNET"
    cfg: dict = None
    scan_iterations: bool = False  # lax.scan over the iterations. The
    # reference shares ONE primal/dual model across iterations, so the param
    # tree is IDENTICAL to the unrolled path (checkpoints move freely);
    # compiles scale with one iteration instead of num_iter.

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_iter=cfg.get("num_iter", 2),
            scan_iterations=bool(cfg.get("scan_iterations", False)),
            num_primal=cfg.get("num_primal", 5),
            num_dual=cfg.get("num_dual", 5),
            primal_arch=str(cfg.get("primal_model_architecture", "UNET")).upper(),
            dual_arch=str(cfg.get("dual_model_architecture", "UNET")).upper(),
            cfg=dict(cfg),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def _primal_model(self):
        cfg = self.cfg or {}
        out = 2 * self.num_primal
        if self.primal_arch == "MWCNN":
            mw = MWCNN(
                input_channels=2 * (self.num_primal + 1),
                first_conv_hidden_channels=cfg.get("primal_mwcnn_hidden_channels", 16),
                num_scales=cfg.get("primal_mwcnn_num_scales", 2),
                dtype=cfg.get("compute_dtype"),
            )
            head_dtype = cfg.get("compute_dtype")

            class _Wrap(nn.Module):
                @nn.compact
                def __call__(self, x):
                    y = nn.Conv(out, (1, 1), dtype=head_dtype)(mw(x))
                    return y.astype(x.dtype)

            return _Wrap()
        if self.primal_arch in ("UNET", "NORMUNET"):
            return NormUnet(
                cfg.get("primal_unet_num_filters", 16),
                cfg.get("primal_unet_num_pool_layers", 2),
                out_chans=out,
                padding_size=cfg.get("primal_unet_padding_size", 11),
                normalize=cfg.get("primal_unet_normalize", True),
                dtype=cfg.get("compute_dtype"),
            )
        # reference lpd.py:70 only implements MWCNN / UNET for the primal net
        raise ValueError(f"LPDNet primal_model_architecture must be MWCNN or UNET, got {self.primal_arch!r}")

    def _dual_model(self):
        cfg = self.cfg or {}
        out = 2 * self.num_dual
        if self.dual_arch == "DIDN":
            return DIDN(
                out_channels=out,
                hidden_channels=cfg.get("kspace_didn_hidden_channels", 32),
                num_dubs=cfg.get("kspace_didn_num_dubs", 2),
                num_convs_recon=cfg.get("kspace_didn_num_convs_recon", 3),
                dtype=cfg.get("compute_dtype"),
            )
        if self.dual_arch in ("UNET", "NORMUNET"):
            return NormUnet(
                cfg.get("dual_unet_num_filters", 16),
                cfg.get("dual_unet_num_pool_layers", 2),
                out_chans=out,
                padding_size=cfg.get("dual_unet_padding_size", 11),
                normalize=cfg.get("dual_unet_normalize", True),
                dtype=cfg.get("compute_dtype"),
            )
        if self.dual_arch == "CONV":  # reference lpd.py:78 conv2d.Conv2d cascade
            return Conv2dCascade(
                out_channels=out,
                hidden_channels=cfg.get("kspace_conv_hidden_channels", 16),
                n_convs=cfg.get("kspace_conv_n_convs", 4),
                batchnorm=cfg.get("kspace_conv_batchnorm", False),
                live_bn=bool(cfg.get("train_batch_stats", False)),
                dtype=cfg.get("compute_dtype"),
            )
        raise ValueError(f"LPDNet dual_model_architecture must be CONV, DIDN or UNET, got {self.dual_arch!r}")

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        m = mask[..., None]

        def fwd(img):
            k = fft2_rv(cmul(img[:, None], sens), self.fft_centered, self.fft_normalization, self.spatial_dims)
            return jnp.where(m == 0, jnp.zeros((), k.dtype), k)

        def adj(k):
            k = jnp.where(m == 0, jnp.zeros((), k.dtype), k)
            return cmul_conj(
                ifft2_rv(k, self.fft_centered, self.fft_normalization, self.spatial_dims), sens
            ).sum(axis=self.coil_dim)

        input_image = adj(y)
        # buffers stacked along the channel (rv) axis
        dual = jnp.concatenate([y] * self.num_dual, axis=-1)  # [B, C, H, W, 2*nd]
        primal = jnp.concatenate([input_image] * self.num_primal, axis=-1)  # [B, H, W, 2*np]

        # The reference passes the SAME primal/dual architecture instance to
        # every PrimalNet/DualNet (lpd.py:110-115), so weights are shared
        # across the num_iter unrolled iterations — instantiate once.
        def step(dual_model, primal_model, primal, dual):
            f2 = fwd(primal[..., 2:4])
            dual_in = jnp.concatenate([dual, f2, y], axis=-1)  # [B, C, H, W, 2(nd+2)]
            b, c, h, w, ch = dual_in.shape
            dual = dual_model(dual_in.reshape(b * c, h, w, ch)).reshape(b, c, h, w, 2 * self.num_dual)
            h1 = adj(dual[..., 0:2])
            primal = primal_model(jnp.concatenate([primal, h1], axis=-1))
            return primal, dual

        if self.scan_iterations:
            if (self.cfg or {}).get("kspace_conv_batchnorm"):
                raise ValueError("scan_iterations does not support batchnorm regularizers; use the unrolled path")
            # weight-sharing makes this a pure params-broadcast scan: the body
            # traces once, so the submodules it creates get the same names as
            # the unrolled path's (dual first, primal second) and the param
            # tree is identical.
            def body(mdl, carry, _):
                return step(mdl._dual_model(), mdl._primal_model(), *carry), None

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=self.num_iter,
            )
            (primal, dual), _ = scan(self, (primal, dual), None)
            return ModelOutput(prediction=primal[..., 0:2])

        dual_model = self._dual_model()
        primal_model = self._primal_model()
        for _ in range(self.num_iter):
            primal, dual = step(dual_model, primal_model, primal, dual)

        out = primal[..., 0:2]
        return ModelOutput(prediction=out)
