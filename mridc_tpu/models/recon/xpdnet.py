"""XPDNet: cross-domain primal-dual with MWCNN/DIDN regularizers.

Functional parity with reference:
mridc/collections/reconstruction/nn/xpdnet.py:23 and
crossdomain/crossdomain.py:14 (``CrossDomainNetwork``): per "K" step the
k-space buffer is refined from [buffer, forward(primal images), y]; per "I"
step the image buffer is refined from [buffer, backward(k-space buffer)];
``use_primal_only`` replaces the k-space model with the residual correction.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.didn import DIDN
from mridc_tpu.nn.mwcnn import MWCNN
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["XPDNet"]


class XPDNet(BaseReconModel):
    num_iter: int = 2
    num_primal: int = 5
    num_dual: int = 1
    use_primal_only: bool = True
    image_arch: str = "MWCNN"
    kspace_arch: str = "CONV"
    cfg: dict = None

    @classmethod
    def from_config(cls, cfg):
        use_primal_only = cfg.get("use_primal_only", True)
        return cls(
            num_iter=cfg.get("num_iter", 2),
            num_primal=cfg.get("num_primal", 5),
            num_dual=1 if use_primal_only else cfg.get("num_dual", 5),
            use_primal_only=use_primal_only,
            image_arch=str(cfg.get("image_model_architecture", "MWCNN")).upper(),
            kspace_arch=str(cfg.get("kspace_model_architecture", "CONV")).upper(),
            cfg=dict(cfg),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    def _image_model(self):
        cfg = self.cfg or {}
        out = 2 * self.num_primal
        if self.image_arch == "MWCNN":
            mw = MWCNN(
                input_channels=2 * (self.num_primal + self.num_dual),
                first_conv_hidden_channels=cfg.get("mwcnn_hidden_channels", 16),
                num_scales=cfg.get("mwcnn_num_scales", 2),
                batchnorm=cfg.get("mwcnn_batchnorm", False),
                dtype=cfg.get("compute_dtype"),
            )
            head_dtype = cfg.get("compute_dtype")

            class _Wrap(nn.Module):
                @nn.compact
                def __call__(self, x):
                    y = nn.Conv(out, (3, 3), padding="SAME", dtype=head_dtype)(mw(x))
                    return y.astype(x.dtype)

            return _Wrap()
        return NormUnet(
            cfg.get("imspace_unet_num_filters", 16),
            cfg.get("imspace_unet_num_pool_layers", 2),
            out_chans=out,
            padding_size=cfg.get("imspace_unet_padding_size", 11),
            normalize=cfg.get("imspace_unet_normalize", True),
            dtype=cfg.get("compute_dtype"),
        )

    def _kspace_model(self):
        cfg = self.cfg or {}
        out = 2 * self.num_dual
        if self.kspace_arch == "DIDN":
            return DIDN(
                out_channels=out,
                hidden_channels=cfg.get("dual_didn_hidden_channels", 32),
                num_dubs=cfg.get("dual_didn_num_dubs", 2),
                num_convs_recon=cfg.get("dual_didn_num_convs_recon", 3),
                dtype=cfg.get("compute_dtype"),
            )
        if self.kspace_arch in ("UNET", "NORMUNET"):
            return NormUnet(
                cfg.get("kspace_unet_num_filters", 16),
                cfg.get("kspace_unet_num_pool_layers", 2),
                out_chans=out,
                padding_size=cfg.get("kspace_unet_padding_size", 11),
                normalize=cfg.get("kspace_unet_normalize", True),
                dtype=cfg.get("compute_dtype"),
            )
        from mridc_tpu.nn.conv2d import Conv2dCascade

        return Conv2dCascade(
            out_channels=out,
            hidden_channels=cfg.get("dual_conv_hidden_channels", 16),
            n_convs=cfg.get("dual_conv_n_convs", 4),
            dtype=cfg.get("compute_dtype"),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        m = mask[..., None]

        def fwd(img):
            k = fft2_rv(cmul(img[:, None], sens), self.fft_centered, self.fft_normalization, self.spatial_dims)
            return jnp.where(m == 0, jnp.zeros((), k.dtype), k)

        def bwd(k):
            k = jnp.where(m == 0, jnp.zeros((), k.dtype), k)
            return cmul_conj(
                ifft2_rv(k, self.fft_centered, self.fft_normalization, self.spatial_dims), sens
            ).sum(axis=self.coil_dim)

        image_buffer = jnp.concatenate([bwd(y)] * self.num_primal, axis=-1)
        kspace_buffer = jnp.concatenate([y] * self.num_dual, axis=-1)

        for _ in range(self.num_iter):
            # K step
            fwd_buf = jnp.concatenate(
                [fwd(image_buffer[..., 2 * i : 2 * i + 2]) for i in range(self.num_primal)], axis=-1
            )
            kspace_buffer = jnp.concatenate([kspace_buffer, fwd_buf, y], axis=-1)
            if self.use_primal_only:
                kspace_buffer = kspace_buffer[..., :2] - kspace_buffer[..., 2:4]
            else:
                kmodel = self._kspace_model()
                b, c, h, w, ch = kspace_buffer.shape
                kspace_buffer = kmodel(kspace_buffer.reshape(b * c, h, w, ch)).reshape(
                    b, c, h, w, 2 * self.num_dual
                )
            # I step
            bwd_buf = jnp.concatenate(
                [bwd(kspace_buffer[..., 2 * i : 2 * i + 2]) for i in range(self.num_dual)], axis=-1
            )
            imodel = self._image_model()
            image_buffer = imodel(jnp.concatenate([image_buffer, bwd_buf], axis=-1))

        return ModelOutput(prediction=image_buffer[..., 0:2])
