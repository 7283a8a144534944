"""KIKINet: alternating k-space / image-space networks.

Functional parity with reference:
mridc/collections/reconstruction/nn/kikinet.py:22 — per iteration: k-space
model per coil, SENSE reduce, image model, optional soft DC back to k-space.
k-space model: CONV / DIDN / NormUnet; image model: MWCNN / NormUnet.
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

__all__ = ["KIKINet"]


def _make_kspace_model(cfg):
    arch = str(cfg.get("kspace_model_architecture", "DIDN")).upper()
    if arch == "CONV":
        return lambda: Conv2dCascade(
            out_channels=2,
            hidden_channels=cfg.get("kspace_conv_hidden_channels", 16),
            n_convs=cfg.get("kspace_conv_n_convs", 4),
            batchnorm=cfg.get("kspace_conv_batchnorm", False),
            live_bn=bool(cfg.get("train_batch_stats", False)),
            dtype=cfg.get("compute_dtype"),
        )
    if arch == "DIDN":
        return lambda: DIDN(
            out_channels=2,
            hidden_channels=cfg.get("kspace_didn_hidden_channels", 64),
            num_dubs=cfg.get("kspace_didn_num_dubs", 2),
            num_convs_recon=cfg.get("kspace_didn_num_convs_recon", 3),
            dtype=cfg.get("compute_dtype"),
        )
    if arch in ("UNET", "NORMUNET"):
        return lambda: NormUnet(
            cfg.get("kspace_unet_num_filters", 16),
            cfg.get("kspace_unet_num_pool_layers", 2),
            padding_size=cfg.get("kspace_unet_padding_size", 11),
            normalize=cfg.get("kspace_unet_normalize", True),
            dtype=cfg.get("compute_dtype"),
        )
    raise NotImplementedError(f"KIKINet kspace_model_architecture {arch} not supported")


def _make_image_model(cfg, fft_centered, fft_normalization):
    arch = str(cfg.get("imspace_model_architecture", "MWCNN")).upper()
    if arch == "MWCNN":
        return lambda: MWCNN(
            input_channels=2,
            first_conv_hidden_channels=cfg.get("image_mwcnn_hidden_channels", 16),
            num_scales=cfg.get("image_mwcnn_num_scales", 2),
            batchnorm=cfg.get("image_mwcnn_batchnorm", False),
            live_bn=bool(cfg.get("train_batch_stats", False)),
            dtype=cfg.get("compute_dtype"),
        )
    if arch in ("UNET", "NORMUNET"):
        return lambda: NormUnet(
            cfg.get("imspace_unet_num_filters", 16),
            cfg.get("imspace_unet_num_pool_layers", 2),
            padding_size=cfg.get("imspace_unet_padding_size", 11),
            normalize=cfg.get("imspace_unet_normalize", True),
            dtype=cfg.get("compute_dtype"),
        )
    raise NotImplementedError(f"KIKINet imspace_model_architecture {arch} not supported")


class KIKINet(BaseReconModel):
    num_iter: int = 2
    no_dc: bool = False
    kspace_arch: str = "DIDN"
    image_arch: str = "MWCNN"
    cfg: dict = None
    scan_iterations: bool = False  # lax.scan over the iterations. Weights are
    # shared across iterations (reference [model] * num_iter ModuleLists), so
    # the param tree is IDENTICAL to the unrolled path — checkpoints move
    # freely; compiles scale with one iteration instead of num_iter.

    @classmethod
    def from_config(cls, cfg):
        return cls(
            num_iter=cfg.get("num_iter", 2),
            scan_iterations=bool(cfg.get("scan_iterations", False)),
            no_dc=cfg.get("no_dc", False),
            cfg=dict(cfg),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        cfg = self.cfg or {}
        mask = expand_mask(mask)
        m = mask[..., None]
        dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))

        def reduce(k):
            return cmul_conj(
                ifft2_rv(k, self.fft_centered, self.fft_normalization, self.spatial_dims), sens
            ).sum(axis=self.coil_dim)

        def expand(img):
            return fft2_rv(cmul(img[:, None], sens), self.fft_centered, self.fft_normalization, self.spatial_dims)

        # reference shares ONE kspace model and ONE image model across all
        # iterations ([model] * num_iter ModuleLists, kikinet.py:100-102)
        def step(kmodel, imodel, kspace):
            soft_dc = jnp.where(m.astype(bool), kspace - y, jnp.zeros((), y.dtype)) * dc_weight
            b, c, h, w, _ = kspace.shape
            kspace = kmodel(kspace.reshape(b * c, h, w, 2)).reshape(b, c, h, w, 2)
            image = imodel(reduce(kspace))
            if not self.no_dc:
                # reference kikinet.py:160-175: the DC residual feeds the image,
                # NOT the k-space carried to the next iteration
                image = reduce(kspace - soft_dc - expand(image))
            return kspace, image

        if self.scan_iterations:
            if cfg.get("kspace_conv_batchnorm") or cfg.get("image_mwcnn_batchnorm"):
                # nn.scan here declares only the params collection; BatchNorm's
                # batch_stats would need carried-collection semantics (stats
                # updated num_iter times per step) — unsupported, fail loudly
                raise ValueError("scan_iterations does not support batchnorm regularizers; use the unrolled path")
            # shared weights make this a pure params-broadcast scan: the body
            # traces once, so the submodules it creates get the SAME names as
            # the unrolled path's — the param tree is identical and compiles
            # scale with one iteration. The final iteration's trailing
            # expand() is computed and discarded (scan bodies cannot branch
            # on the index) — numerics unchanged. The image rides the carry
            # (ys=None) so no [num_iter, B, H, W, 2] buffer is materialized.
            def body(mdl, carry, _):
                del mdl
                kspace, _ = carry
                kmodel = _make_kspace_model(cfg)()
                imodel = _make_image_model(cfg, self.fft_centered, self.fft_normalization)()
                _, image = step(kmodel, imodel, kspace)
                return (expand(image), image), None

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=self.num_iter,
            )
            image0 = jnp.zeros(y.shape[:1] + y.shape[2:4] + (2,), y.dtype)
            (_, image), _ = scan(self, (y, image0), None)
            return ModelOutput(prediction=image)

        kmodel = _make_kspace_model(cfg)()
        imodel = _make_image_model(cfg, self.fft_centered, self.fft_normalization)()
        kspace = y
        image = None
        for idx in range(self.num_iter):
            kspace, image = step(kmodel, imodel, kspace)
            if idx < self.num_iter - 1:
                kspace = expand(image)
        return ModelOutput(prediction=image)
