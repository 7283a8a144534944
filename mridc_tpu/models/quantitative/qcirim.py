"""qCIRIM / qRIM: quantitative recurrent inference machines.

Functional parity with reference:
mridc/collections/quantitative/nn/qcirim.py:24 and qrim/qrim_block.py:13 —
cascades of RIM blocks over the 4 quantitative maps [R2*, S0, B0, phi]; each
time step feeds [analytical gradient (4ch), current maps (4ch)] into a
conv+RNN stack (input_size = depth*4 = 8); R2* is clamped non-negative after
every step; gradients are evaluated at the maps from the previous cascade
(reference keeps them fixed within a cascade's time steps).

With ``use_reconstruction_module`` a CIRIM reconstruction runs per echo
first (reference qcirim.py:176-235): each echo's k-space goes through RIM
cascades (reference CIRIM chaining semantics), the reconstructed echoes
replace the measured k-space via the sensitivity expansion, and the
quantitative maps are RE-INITIALIZED from the reconstructions with the
jittable MEGRE fit (signal_model.fit_megre_maps — the reference re-fits with
a host-sequential skimage unwrap; see PARITY.md for the substitution).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.models.quantitative.signal_model import analytical_log_likelihood_gradient, fit_megre_maps
from mridc_tpu.nn.fold import fold_w, unfold_w
from mridc_tpu.nn.layers import ConvNonlinear
from mridc_tpu.nn.rim import RIMBlock
from mridc_tpu.nn.rnn_cells import make_cell
from mridc_tpu.ops.cplx import cmul
from mridc_tpu.ops.fft import fft2_rv

__all__ = ["qRIMBlock", "qCIRIM"]


class _QRIMStep(nn.Module):
    recurrent_layer: str = "IndRNN"
    conv_filters: Sequence[int] = (64, 64, 4)
    conv_kernels: Sequence[int] = (5, 3, 3)
    conv_dilations: Sequence[int] = (1, 2, 1)
    conv_bias: Sequence[bool] = (True, True, False)
    recurrent_filters: Sequence[int] = (64, 64, 0)
    recurrent_kernels: Sequence[int] = (1, 1, 0)
    recurrent_dilations: Sequence[int] = (1, 1, 0)
    recurrent_bias: Sequence[bool] = (True, True, False)
    lane_fold: bool = False  # folded conv stack (nn/fold.py; exact)
    compute_dtype: str = None  # opt-in bf16 conv/RNN compute; the map carry,
    # R2* clamp and signal-model gradient stay f32 (params stay f32 too)

    @nn.compact
    def __call__(self, carry, _, grad_channels):
        maps, hx = carry  # maps [B, H, W, 4]
        x = jnp.concatenate([grad_channels, maps], axis=-1)  # [B, H, W, 8]
        if self.lane_fold:
            x = fold_w(x)
        new_hx = []
        nonlinears = ["relu", "relu", None]
        h_idx = 0
        final = None
        for cf, ck, cd, cb, rf, rk, rd, rb, nl in zip(
            self.conv_filters,
            self.conv_kernels,
            self.conv_dilations,
            self.conv_bias,
            self.recurrent_filters,
            self.recurrent_kernels,
            self.recurrent_dilations,
            self.recurrent_bias,
            nonlinears,
        ):
            conv = (
                ConvNonlinear(cf, ck, cd, cb, nl, dtype=self.compute_dtype, lane_fold=self.lane_fold)
                if cf != 0
                else None
            )
            if rf != 0 and nl is not None:
                x = conv(x)
                cell = make_cell(
                    self.recurrent_layer, rf, rk, rd, rb,
                    dtype=self.compute_dtype, lane_fold=self.lane_fold,
                )
                x = cell(x, hx[h_idx]).astype(hx[h_idx].dtype)
                new_hx.append(x)
                h_idx += 1
            else:
                final = conv
        dx = final(x)
        if self.lane_fold:
            dx = unfold_w(dx)
        maps = maps + dx.astype(maps.dtype)
        # clamp R2* (channel 0) non-negative
        maps = maps.at[..., 0].set(jnp.maximum(maps[..., 0], 0.0))
        return (maps, tuple(new_hx)), maps


class qRIMBlock(BaseReconModel):
    recurrent_layer: str = "IndRNN"
    conv_filters: Sequence[int] = (64, 64, 4)
    conv_kernels: Sequence[int] = (5, 3, 3)
    conv_dilations: Sequence[int] = (1, 2, 1)
    conv_bias: Sequence[bool] = (True, True, False)
    recurrent_filters: Sequence[int] = (64, 64, 0)
    recurrent_kernels: Sequence[int] = (1, 1, 0)
    recurrent_dilations: Sequence[int] = (1, 1, 0)
    recurrent_bias: Sequence[bool] = (True, True, False)
    time_steps: int = 8
    lane_fold: str = "auto"  # fold the conv/RNN stack on non-CPU backends
    # (IndRNN only, even W; exact — see nn/fold.py)
    compute_dtype: str = None  # opt-in bf16 conv/RNN compute (maps/fits f32)
    remat: object = True  # time-step rematerialization, like nn/rim.py
    # RIMBlock: the backward recomputes each step's conv/RNN stack instead of
    # storing T x cascades x activations (the analytical MEGRE gradient is
    # computed once per cascade OUTSIDE the scan and broadcast, so it is never
    # recomputed). Value-identical; without it the qCIRIM train step at
    # production size (320x320, 15 coils, 4 echoes) exhausts v5e HBM at batch 4.

    @nn.compact
    def __call__(self, y, maps, tes, sens, sampling_mask, gamma):
        """y [B, E, C, H, W, 2]; maps [B, H, W, 4] (normalized); gamma (4,)."""
        r2s = maps[..., 0] * gamma[0]
        s0 = maps[..., 1] * gamma[1]
        b0 = maps[..., 2] * gamma[2]
        phi = maps[..., 3] * gamma[3]
        grad = analytical_log_likelihood_gradient(
            r2s,
            s0,
            b0,
            phi,
            tes,
            sens,
            y,
            sampling_mask,
            self.fft_centered,
            self.fft_normalization,
            self.spatial_dims,
            coil_dim=2,
        )
        grad = jnp.nan_to_num(jnp.transpose(grad, (0, 2, 3, 1)) / 100.0)  # [B, H, W, 4]

        b, h, w = maps.shape[0], maps.shape[1], maps.shape[2]
        fold = self.lane_fold == "always" or (
            self.lane_fold == "auto"
            and jax.default_backend() != "cpu"
            and self.recurrent_layer.upper() == "INDRNN"
            and w % 2 == 0
        )
        hx_w = w // 2 if fold else w
        hx_dtype = self.compute_dtype or jnp.float32
        hx = tuple(
            jnp.zeros((b, h, hx_w, 2 * f if fold else f), hx_dtype)
            for f in self.recurrent_filters
            if f != 0
        )
        step_cls = (
            nn.remat(_QRIMStep, prevent_cse=False)
            if self.remat is True or self.remat == "step"
            else _QRIMStep
        )
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast),
            out_axes=0,
            length=self.time_steps,
        )(
            recurrent_layer=self.recurrent_layer,
            conv_filters=self.conv_filters,
            conv_kernels=self.conv_kernels,
            conv_dilations=self.conv_dilations,
            conv_bias=self.conv_bias,
            recurrent_filters=self.recurrent_filters,
            recurrent_kernels=self.recurrent_kernels,
            recurrent_dilations=self.recurrent_dilations,
            recurrent_bias=self.recurrent_bias,
            lane_fold=fold,
            compute_dtype=self.compute_dtype,
        )
        (maps, _), all_maps = scan((maps, hx), None, grad)
        return all_maps, maps


def _parse_qremat(mode) -> bool:
    """qCIRIM supports per-time-step remat only (the MEGRE gradient already
    lives outside the scan, so there is no cascade-level trade to make)."""
    mode_s = str(mode).lower()
    if mode is True or mode_s == "step":
        return True
    if mode is False or mode_s == "none":
        return False
    raise ValueError(f"qCIRIM remat_mode must be 'step' or 'none', got {mode!r}")


class qCIRIM(BaseReconModel):
    """Forward signature (rv layout):
    ``__call__(y, sens, sampling_mask, maps_init, tes)`` with
    y [B, E, C, H, W, 2], maps_init [B, H, W, 4], returns stacked intermediate
    maps [cascades, T, B, H, W, 4]."""

    num_cascades: int = 5
    time_steps: int = 8
    recurrent_layer: str = "IndRNN"
    conv_filters: Sequence[int] = (64, 64, 4)
    conv_kernels: Sequence[int] = (5, 3, 3)
    conv_dilations: Sequence[int] = (1, 2, 1)
    conv_bias: Sequence[bool] = (True, True, False)
    recurrent_filters: Sequence[int] = (64, 64, 0)
    recurrent_kernels: Sequence[int] = (1, 1, 0)
    recurrent_dilations: Sequence[int] = (1, 1, 0)
    recurrent_bias: Sequence[bool] = (True, True, False)
    gamma: Sequence[float] = (150.0, 150.0, 600.0, 150.0)
    use_reconstruction_module: bool = False
    recon_num_cascades: int = 5
    recon_time_steps: int = 8
    recon_recurrent_layer: str = "IndRNN"
    recon_conv_filters: Sequence[int] = (64, 64, 2)
    recon_recurrent_filters: Sequence[int] = (64, 64, 0)
    recon_keep_prediction: bool = True
    compute_dtype: str = None  # opt-in bf16 conv/RNN compute for the qRIM
    # trunk and the optional recon module; map carries, MEGRE fits, the
    # analytical gradient and all clamps stay f32. Params stay f32.
    remat: object = True  # time-step remat of the qRIM scan (see qRIMBlock)

    @classmethod
    def from_config(cls, cfg):
        g = lambda k, d: cfg.get(f"quantitative_module_{k}", d)  # noqa: E731
        r = lambda k, d: cfg.get(f"reconstruction_module_{k}", d)  # noqa: E731
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            use_reconstruction_module=bool(cfg.get("use_reconstruction_module", False)),
            recon_num_cascades=r("num_cascades", 5),
            recon_time_steps=r("time_steps", 8),
            recon_recurrent_layer=r("recurrent_layer", "IndRNN"),
            recon_conv_filters=tuple(r("conv_filters", (64, 64, 2))),
            recon_recurrent_filters=tuple(r("recurrent_filters", (64, 64, 0))),
            recon_keep_prediction=bool(r("keep_prediction", True)),
            num_cascades=g("num_cascades", 5),
            time_steps=g("time_steps", 8),
            recurrent_layer=g("recurrent_layer", "IndRNN"),
            conv_filters=tuple(g("conv_filters", (64, 64, 4))),
            conv_kernels=tuple(g("conv_kernels", (5, 3, 3))),
            conv_dilations=tuple(g("conv_dilations", (1, 2, 1))),
            conv_bias=tuple(g("conv_bias", (True, True, False))),
            recurrent_filters=tuple(g("recurrent_filters", (64, 64, 0))),
            recurrent_kernels=tuple(g("recurrent_kernels", (1, 1, 0))),
            recurrent_dilations=tuple(g("recurrent_dilations", (1, 1, 0))),
            recurrent_bias=tuple(g("recurrent_bias", (True, True, False))),
            gamma=tuple(g("gamma_regularization_factors", (150.0, 150.0, 600.0, 150.0))),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
            remat=_parse_qremat(cfg.get("remat_mode", "step")),
        )

    @nn.compact
    def __call__(self, y, sens, sampling_mask, maps_init, tes, train: bool = False) -> ModelOutput:
        gamma = jnp.asarray(self.gamma, jnp.float32)
        recon_intermediates = None

        if self.use_reconstruction_module:
            # reference qcirim.py:176-210: per-echo CIRIM with the golden-tested
            # CIRIM chaining (later cascades start from the previous final eta,
            # detached), then replace y by the expanded reconstructions and
            # re-initialize the maps from the reconstructed echoes.
            mask4 = sampling_mask if sampling_mask.ndim == 4 else sampling_mask[:, 0, 0, :, :, 0][:, None]
            echo_preds = []
            recon_inter = []  # per echo: [C, T, B, H, W, 2] time-step stacks
            for e in range(y.shape[1]):
                eta = None
                casc_etas = []
                for c in range(self.recon_num_cascades):
                    block = RIMBlock(
                        recurrent_layer=self.recon_recurrent_layer,
                        conv_filters=self.recon_conv_filters,
                        recurrent_filters=self.recon_recurrent_filters,
                        time_steps=self.recon_time_steps,
                        fft_centered=self.fft_centered,
                        fft_normalization=self.fft_normalization,
                        spatial_dims=self.spatial_dims,
                        coil_dim=1,
                        compute_dtype=self.compute_dtype,
                        pointwise_matmul=train,
                    )
                    etas, eta_final = block(y[:, e], sens, mask4, eta=eta)
                    casc_etas.append(etas)
                    eta = (
                        jax.lax.stop_gradient(eta_final)
                        if self.recon_keep_prediction
                        else None
                    )
                echo_preds.append(eta_final)
                if casc_etas[0] is not None:
                    recon_inter.append(jnp.stack(casc_etas, 0))
            pred = jnp.stack(echo_preds, axis=1)  # [B, E, H, W, 2]
            recon_intermediates = jnp.stack(recon_inter, 0) if recon_inter else None
            y = fft2_rv(
                cmul(pred[:, :, None], sens[:, None]),
                self.fft_centered,
                self.fft_normalization,
                self.spatial_dims,
            )
            maps_init = fit_megre_maps(pred, tes)

        maps = maps_init / gamma[None, None, None, :]
        if sampling_mask.ndim == 4:  # [B, 1, H, W] -> [B, 1(echo), 1(coil), H, W, 1]
            sampling_mask = sampling_mask[:, None, ..., None]
        all_casc = []
        for _ in range(self.num_cascades):
            block = qRIMBlock(
                recurrent_layer=self.recurrent_layer,
                conv_filters=self.conv_filters,
                conv_kernels=self.conv_kernels,
                conv_dilations=self.conv_dilations,
                conv_bias=self.conv_bias,
                recurrent_filters=self.recurrent_filters,
                recurrent_kernels=self.recurrent_kernels,
                recurrent_dilations=self.recurrent_dilations,
                recurrent_bias=self.recurrent_bias,
                time_steps=self.time_steps,
                fft_centered=self.fft_centered,
                fft_normalization=self.fft_normalization,
                spatial_dims=self.spatial_dims,
                compute_dtype=self.compute_dtype,
                remat=self.remat,
            )
            etas, maps = block(y, maps, tes, sens, sampling_mask, gamma)
            all_casc.append(etas)
        intermediates = jnp.stack(all_casc, 0)  # [C, T, B, H, W, 4]
        # unnormalize the final maps
        final = intermediates[-1, -1] * gamma[None, None, None, :]
        return ModelOutput(
            prediction=final,
            intermediates=intermediates,
            recon_intermediates=(
                recon_intermediates if self.use_reconstruction_module else None
            ),
        )
