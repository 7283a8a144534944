"""qVarNet: variational network in quantitative-parameter space.

Functional parity with reference:
mridc/collections/quantitative/nn/qvn.py:23 and qvarnet/qvn_block.py:13.

Default (``map_threading="complex"``) reproduces the reference graph exactly
(golden-tested in tests/test_golden_qvn.py): COMPLEX maps threaded between
cascades (qvn.py:210-245); per cascade the unnormalized complex maps run the
complex MEGRE signal model, soft DC in k-space, a sens-conj reduction that
sums over the ECHO axis leaving coils as the regularizer channels
(qvn_block.py:157-168 with ``coil_dim=1`` — pinned upstream quirk), NormUnet
-> complex residual added to the previous ABS map stack, and a clamp on both
re/im of the R2* channel. The final maps are |complex maps| * gamma (per-map
gamma; the reference's ``RescaleByMax.reverse`` mis-indexes gamma by BATCH
element — pinned upstream bug, PARITY.md).

``map_threading="real"`` keeps the round-2 re-design: real 4-channel maps,
echo-residual stack into the regularizer.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput
from mridc_tpu.models.quantitative.signal_model import (
    fit_megre_maps,
    megre_signal,
    megre_signal_complex,
)
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["qVarNet"]


def _safe_cmag(x: jnp.ndarray) -> jnp.ndarray:
    """|complex| over a real-view [..., 2] with a zero-safe gradient.

    Forward-identical to ``sqrt(re^2 + im^2)``; at exactly (0, 0) — which the
    R2* clamp produces — the plain sqrt has a NaN gradient, poisoning the
    whole backward pass. Subgradient 0 there instead."""
    sq = x[..., 0] ** 2 + x[..., 1] ** 2
    zero = sq == 0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))


class qVarNet(BaseReconModel):
    num_cascades: int = 8
    channels: int = 18
    pooling_layers: int = 4
    padding_size: int = 11
    normalize: bool = True
    gamma: Sequence[float] = (150.0, 150.0, 600.0, 150.0)
    map_threading: str = "complex"  # "complex" (reference graph) | "real" (re-design)
    use_reconstruction_module: bool = False
    recon_num_cascades: int = 8
    recon_channels: int = 18
    recon_pooling_layers: int = 4
    recon_no_dc: bool = False
    compute_dtype: str = None  # opt-in bf16 compute for the NormUnet
    # regularizers and the optional recon module; the MEGRE signal model,
    # DC/FFT chain, map threading and clamps stay f32. Params stay f32.

    @classmethod
    def from_config(cls, cfg):
        g = lambda k, d: cfg.get(f"quantitative_module_{k}", d)  # noqa: E731
        r = lambda k, d: cfg.get(f"reconstruction_module_{k}", d)  # noqa: E731
        threading = str(g("map_threading", "complex")).lower()
        if threading not in ("complex", "real"):
            raise ValueError(
                f"quantitative_module_map_threading must be 'complex' or 'real', got {threading!r}"
            )
        dtype = cfg.get("compute_dtype")
        if dtype and "bf" in str(dtype).lower() and not cfg.get("quantitative_module_allow_bf16", False):
            # Certification attempted and FAILED (tools/dtype_cert.py qvn,
            # 2026-08-19): at the 150/150/600/150 gamma defaults the complex-map
            # threading amplifies regularizer rounding through the MEGRE
            # exponentials (the complex-B0 cosh overflows within a few
            # cascades once perturbed), so bf16 outputs cannot be certified
            # against f32. docs/performance.md knob table has the details.
            raise ValueError(
                "compute_dtype=bfloat16 is NOT certified for qVarNet: the "
                "150-600x gamma_regularization_factors amplify bf16 rounding "
                "through the MEGRE exponentials (measured: tools/dtype_cert.py). "
                "Use f32 (drop compute_dtype), or accept uncertified outputs "
                "explicitly with quantitative_module_allow_bf16: true"
            )
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            use_reconstruction_module=bool(cfg.get("use_reconstruction_module", False)),
            recon_num_cascades=r("num_cascades", 8),
            recon_channels=r("channels", 18),
            recon_pooling_layers=r("pooling_layers", 4),
            recon_no_dc=bool(r("no_dc", False)),
            num_cascades=g("num_cascades", 8),
            channels=g("channels", 18),
            pooling_layers=g("pooling_layers", 4),
            padding_size=g("padding_size", 11),
            normalize=g("normalize", True),
            gamma=tuple(g("gamma_regularization_factors", (150.0, 150.0, 600.0, 150.0))),
            map_threading=threading,
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, sampling_mask, maps_init, tes, train: bool = False) -> ModelOutput:
        gamma = jnp.asarray(self.gamma, jnp.float32)

        if self.use_reconstruction_module:
            # reference qvn.py:145-175: per-echo E2E-VarNet cascades over the
            # echo's k-space, then replace y with the expanded reconstructions
            # and re-initialize the maps (jittable fit — see PARITY.md).
            from mridc_tpu.models.recon.vn import _VarNetBlock
            from mridc_tpu.nn.dc import sens_reduce as _sens_reduce

            mask4 = sampling_mask if sampling_mask.ndim == 4 else sampling_mask[:, 0, 0, :, :, 0][:, None]
            maskb = mask4[..., None]  # broadcast against [B, C, H, W, 2]
            echo_preds = []
            blocks = [
                _VarNetBlock(
                    channels=self.recon_channels,
                    pooling_layers=self.recon_pooling_layers,
                    no_dc=self.recon_no_dc,
                    fft_centered=self.fft_centered,
                    fft_normalization=self.fft_normalization,
                    spatial_dims=self.spatial_dims,
                    coil_dim=1,
                    compute_dtype=self.compute_dtype,
                )
                for _ in range(self.recon_num_cascades)
            ]
            for e in range(y.shape[1]):
                pred = y[:, e]
                for block in blocks:
                    pred = block(pred, y[:, e], sens, maskb, train)
                echo_preds.append(
                    _sens_reduce(pred, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, 1)
                )
            pred_img = jnp.stack(echo_preds, axis=1)  # [B, E, H, W, 2]
            y = fft2_rv(
                cmul(pred_img[:, :, None], sens[:, None]),
                self.fft_centered,
                self.fft_normalization,
                self.spatial_dims,
            )
            maps_init = fit_megre_maps(pred_img, tes)

        if sampling_mask.ndim == 4:
            sampling_mask = sampling_mask[:, None, ..., None]
        sens_e = sens[:, None]
        if self.map_threading != "complex":
            return self._real_cascades(y, sens_e, sampling_mask, maps_init, tes, gamma, train)

        # ---- reference complex-map threading (qvn.py:210-245) ----
        # maps_cv [B, H, W, 4, 2]: gamma-normalized complex maps (real view);
        # running_pred [B, 4, H, W, 2]: the block's `prediction` argument —
        # real init maps at cascade 0, |prev cascade maps| afterwards.
        maps_n = maps_init / gamma[None, None, None, :]
        maps_cv = jnp.stack([maps_n, jnp.zeros_like(maps_n)], axis=-1)
        running_pred = jnp.moveaxis(maps_n, -1, 1)[..., None] * jnp.asarray([1.0, 0.0])
        final_pred = None
        for i in range(self.num_cascades):
            scaled = maps_cv * gamma[None, None, None, :, None]  # unnormalize (complex x real)
            pred = megre_signal_complex(
                scaled[..., 0, :], scaled[..., 1, :], scaled[..., 2, :], scaled[..., 3, :], tes
            )  # [B, E, H, W, 2]
            pred_k = fft2_rv(
                cmul(pred[:, :, None], sens_e), self.fft_centered, self.fft_normalization, self.spatial_dims
            )
            dc_weight = self.param(f"dc_weight_{i}", nn.initializers.ones, (1,))
            soft = (pred_k - y) * sampling_mask * dc_weight
            # reference qvn_block sens-reduces with coil_dim=1, i.e. it sums
            # over the ECHO axis and keeps COILS as the regularizer channels
            # (qvn_block.py:104-108,163 — pinned upstream quirk)
            resid = cmul_conj(
                ifft2_rv(soft, self.fft_centered, self.fft_normalization, self.spatial_dims), sens_e
            ).sum(axis=1)  # [B, C, H, W, 2]
            b, c, h, w, _ = resid.shape
            # torch complex_to_chan_dim order: [re_c0..re_cN, im_c0..im_cN]
            reg_in = jnp.moveaxis(resid, -1, 1).reshape(b, 2 * c, h, w).transpose(0, 2, 3, 1)
            unet = NormUnet(
                self.channels,
                self.pooling_layers,
                out_chans=8,
                padding_size=self.padding_size,
                normalize=self.normalize,
                dtype=self.compute_dtype,
            )
            out = unet(reg_in, train)  # [B, H, W, 8]
            # torch chan_complex_to_last_dim: [B, 2*4, H, W] -> [B, 4, H, W, 2]
            upd = jnp.moveaxis(out.transpose(0, 3, 1, 2).reshape(b, 2, 4, h, w), 1, -1)
            new_pred = running_pred + upd
            # clamp BOTH re and im of the R2* channel at >= 0 (the reference
            # clamps the view_as_real slice, qvn_block.py:166-168)
            new_pred = new_pred.at[:, 0].set(jnp.maximum(new_pred[:, 0], 0.0))
            final_pred = new_pred
            maps_cv = jnp.moveaxis(new_pred, 1, 3)  # [B, H, W, 4, 2]
            mag = _safe_cmag(new_pred)  # [B, 4, H, W]
            running_pred = jnp.stack([mag, jnp.zeros_like(mag)], axis=-1)
        # final maps: |complex maps| per map x gamma. (The reference's
        # RescaleByMax.reverse indexes gamma by BATCH element — upstream bug,
        # PARITY.md — so the unnormalization here is the per-map intent.)
        mag = _safe_cmag(final_pred)  # [B, 4, H, W]
        final = jnp.moveaxis(mag, 1, -1) * gamma[None, None, None, :]
        return ModelOutput(prediction=final, intermediates=final_pred)

    def _real_cascades(self, y, sens_e, sampling_mask, maps_init, tes, gamma, train):
        """Round-2 re-design (opt-in ``map_threading="real"``): real 4-channel
        maps, echo-residual stack into the regularizer."""
        maps = maps_init / gamma[None, None, None, :]
        for i in range(self.num_cascades):
            r2s = maps[..., 0] * gamma[0]
            s0 = maps[..., 1] * gamma[1]
            b0 = maps[..., 2] * gamma[2]
            phi = maps[..., 3] * gamma[3]
            pred = megre_signal(r2s, s0, b0, phi, tes)  # [B, E, H, W, 2]
            pred_k = fft2_rv(
                cmul(pred[:, :, None], sens_e), self.fft_centered, self.fft_normalization, self.spatial_dims
            )
            dc_weight = self.param(f"dc_weight_{i}", nn.initializers.ones, (1,))
            soft = (pred_k - y) * sampling_mask * dc_weight
            resid = cmul_conj(
                ifft2_rv(soft, self.fft_centered, self.fft_normalization, self.spatial_dims), sens_e
            ).sum(axis=2)  # [B, E, H, W, 2]
            # stack echo residuals into channels for the regularizer
            b, e, h, w, _ = resid.shape
            reg_in = resid.transpose(0, 2, 3, 1, 4).reshape(b, h, w, 2 * e)
            unet = NormUnet(
                self.channels,
                self.pooling_layers,
                out_chans=4,
                padding_size=self.padding_size,
                normalize=self.normalize,
                dtype=self.compute_dtype,
            )
            maps = maps + unet(reg_in, train)
            maps = maps.at[..., 0].set(jnp.maximum(maps[..., 0], 0.0))
        final = maps * gamma[None, None, None, :]
        return ModelOutput(prediction=final)
