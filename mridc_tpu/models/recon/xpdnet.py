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
import jax
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.nn.didn import DIDN
from mridc_tpu.nn.mwcnn import MWCNN
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["XPDNet", "stack_iteration_params"]


def stack_iteration_params(params, num_iter):
    """Convert an unrolled XPDNet param tree to the ``scan_iterations`` layout.

    The unrolled forward creates per-iteration top-level modules auto-named
    by class (``DIDN_0..n``, ``MWCNN_0..n``, ``NormUnet_0..2n`` when both
    domains use UNETs — flax counts per class, in creation order kspace
    first then image). The scanned forward holds ONE iteration's modules
    under ``Scan_XPDIter_0`` with every leaf stacked on a leading
    ``num_iter`` axis. This restacks the former into the latter so trained
    unrolled checkpoints can run (and keep training) under the scan path.
    """
    import collections
    import re

    groups = collections.defaultdict(dict)
    passthrough = {}
    for key, sub in params.items():
        mt = re.match(r"(.+)_(\d+)$", key)
        if mt is None:
            if key == "model":
                # use_sens_net wraps the recon model: convert the nested
                # tree, keep the SensitivityModel untouched
                passthrough[key] = stack_iteration_params(sub, num_iter)
                continue
            raise ValueError(f"unexpected non-indexed param scope {key!r}")
        if mt.group(1) == "SensitivityModel":
            passthrough[key] = sub
            continue
        groups[mt.group(1)][int(mt.group(2))] = sub
    if passthrough and "model" in passthrough:
        return {**passthrough}
    children = {}
    for cls, idx_map in groups.items():
        if len(idx_map) % num_iter:
            raise ValueError(
                f"scope {cls!r} has {len(idx_map)} instances, not a multiple of num_iter={num_iter}"
            )
        per_iter = len(idx_map) // num_iter
        for j in range(per_iter):
            children[f"{cls}_{j}"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, 0),
                *[idx_map[i * per_iter + j] for i in range(num_iter)],
            )
    return {"Scan_XPDIter_0": children}


def _make_fwd_bwd(m, sens, fft_centered, fft_normalization, spatial_dims, coil_dim):
    """The masked SENSE forward/adjoint pair shared by the unrolled and
    scanned paths — single home so the two cannot drift."""

    def fwd(img):
        k = fft2_rv(cmul(img[:, None], sens), fft_centered, fft_normalization, spatial_dims)
        return jnp.where(m == 0, jnp.zeros((), k.dtype), k)

    def bwd(k):
        k = jnp.where(m == 0, jnp.zeros((), k.dtype), k)
        return cmul_conj(ifft2_rv(k, fft_centered, fft_normalization, spatial_dims), sens).sum(axis=coil_dim)

    return fwd, bwd


def _xpd_step(
    image_model, kspace_model, use_primal_only, num_primal, num_dual,
    image_buffer, kspace_buffer, y, fwd, bwd,
):
    """One primal-dual iteration (K step then I step). Both models are
    zero-arg builders invoked in the reference's order — kspace first, image
    second — so flax auto-naming (and therefore checkpoint layout) is
    identical to the pre-refactor unrolled loop."""
    fwd_buf = jnp.concatenate(
        [fwd(image_buffer[..., 2 * i : 2 * i + 2]) for i in range(num_primal)], axis=-1
    )
    kspace_buffer = jnp.concatenate([kspace_buffer, fwd_buf, y], axis=-1)
    if use_primal_only:
        kspace_buffer = kspace_buffer[..., :2] - kspace_buffer[..., 2:4]
    else:
        kmodel = kspace_model()
        b, c, h, w, ch = kspace_buffer.shape
        kspace_buffer = kmodel(kspace_buffer.reshape(b * c, h, w, ch)).reshape(
            b, c, h, w, 2 * num_dual
        )
    bwd_buf = jnp.concatenate(
        [bwd(kspace_buffer[..., 2 * i : 2 * i + 2]) for i in range(num_dual)], axis=-1
    )
    image_buffer = image_model()(jnp.concatenate([image_buffer, bwd_buf], axis=-1))
    return image_buffer, kspace_buffer


class XPDNet(BaseReconModel):
    num_iter: int = 2
    num_primal: int = 5
    num_dual: int = 1
    use_primal_only: bool = True
    image_arch: str = "MWCNN"
    kspace_arch: str = "CONV"
    cfg: dict = None
    scan_iterations: bool = False  # lax.scan over iterations with stacked
    # per-iteration params: ~num_iter x faster compiles for the deep default
    # configs, bit-identical math. The param tree differs from the unrolled
    # layout ([num_iter, ...]-stacked leaves under one scope), so checkpoints
    # do NOT move between the two modes; goldens/imports cover unrolled.

    @classmethod
    def from_config(cls, cfg):
        use_primal_only = cfg.get("use_primal_only", True)
        return cls(
            num_iter=cfg.get("num_iter", 2),
            scan_iterations=bool(cfg.get("scan_iterations", False)),
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
                live_bn=bool(cfg.get("train_batch_stats", False)),
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
        fwd, bwd = _make_fwd_bwd(
            m, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
        )

        image_buffer = jnp.concatenate([bwd(y)] * self.num_primal, axis=-1)
        kspace_buffer = jnp.concatenate([y] * self.num_dual, axis=-1)

        if self.scan_iterations:
            if (self.cfg or {}).get("mwcnn_batchnorm"):
                raise ValueError("scan_iterations does not support batchnorm regularizers; use the unrolled path")
            scan = nn.scan(
                _XPDIter,
                variable_axes={"params": 0},  # per-iteration params, stacked
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.num_iter,
            )(
                num_primal=self.num_primal,
                num_dual=self.num_dual,
                use_primal_only=self.use_primal_only,
                image_arch=self.image_arch,
                kspace_arch=self.kspace_arch,
                cfg=self.cfg,
                fft_centered=self.fft_centered,
                fft_normalization=self.fft_normalization,
                spatial_dims=self.spatial_dims,
                coil_dim=self.coil_dim,
            )
            (image_buffer, _), _ = scan((image_buffer, kspace_buffer), None, y, sens, m)
            return ModelOutput(prediction=image_buffer[..., 0:2])

        for _ in range(self.num_iter):
            image_buffer, kspace_buffer = _xpd_step(
                self._image_model, self._kspace_model, self.use_primal_only,
                self.num_primal, self.num_dual,
                image_buffer, kspace_buffer, y, fwd, bwd,
            )

        return ModelOutput(prediction=image_buffer[..., 0:2])


class _XPDIter(BaseReconModel):
    """One scanned XPDNet iteration; shares _xpd_step with the unrolled path
    (the fwd/bwd operators are rebuilt per step from the broadcast inputs)."""

    num_primal: int = 5
    num_dual: int = 1
    use_primal_only: bool = True
    image_arch: str = "MWCNN"
    kspace_arch: str = "CONV"
    cfg: dict = None

    # reuse XPDNet's builders (they only read the fields above)
    _image_model = XPDNet._image_model
    _kspace_model = XPDNet._kspace_model

    @nn.compact
    def __call__(self, carry, _, y, sens, m):
        image_buffer, kspace_buffer = carry
        fwd, bwd = _make_fwd_bwd(
            m, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
        )
        image_buffer, kspace_buffer = _xpd_step(
            self._image_model, self._kspace_model, self.use_primal_only,
            self.num_primal, self.num_dual,
            image_buffer, kspace_buffer, y, fwd, bwd,
        )
        return (image_buffer, kspace_buffer), None
