"""Recurrent Inference Machine block with a `lax.scan` over time steps.

Functional parity with reference:
mridc/collections/reconstruction/nn/rim/rim_block.py:12 (``RIMBlock`` — the
time-step loop at :248-283 becomes a single `nn.scan`, so the conv/GRU stack is
traced once and XLA pipelines the unroll), rim/conv_layers.py (``ConvRNNStack``
:10), rim/rnn_cells.py (cells).

Layout: real views throughout — the image estimate ``eta`` is [B, H, W, 2]
(the 2 re/im channels double as conv channels), hidden states are
[B, H, W, F] NHWC feeding the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from mridc_tpu.nn.dc import (
    expand_rv_mask,
    log_likelihood_gradient,
    log_likelihood_gradient_psf1d,
    psf1d_gauss_mats,
    sens_expand,
    sens_reduce,
    soft_dc,
)
from mridc_tpu.nn.fold import fold_w, unfold_w
from mridc_tpu.nn.layers import ConvNonlinear
from mridc_tpu.nn.rnn_cells import make_cell

__all__ = ["RIMBlock"]


class _RIMStep(nn.Module):
    """One RIM time step: likelihood gradient -> conv/RNN stack -> delta-eta."""

    recurrent_layer: str = "IndRNN"
    conv_filters: Sequence[int] = (64, 64, 2)
    conv_kernels: Sequence[int] = (5, 3, 3)
    conv_dilations: Sequence[int] = (1, 2, 1)
    conv_bias: Sequence[bool] = (True, True, False)
    recurrent_filters: Sequence[int] = (64, 64, 0)
    recurrent_kernels: Sequence[int] = (1, 1, 0)
    recurrent_dilations: Sequence[int] = (1, 1, 0)
    recurrent_bias: Sequence[bool] = (True, True, False)
    fft_centered: bool = False
    fft_normalization: str = "backward"
    spatial_dims: Sequence[int] = (-2, -1)
    coil_dim: int = 1
    compute_dtype: Optional[str] = None
    stack_etas: bool = True  # False: skip stacking per-step etas (inference —
    # saves T x [B, H, W, 2] HBM writes; training needs them for step weighting)
    dc_psf1d: bool = False  # 1D-mask PSF fast path: mask/z0 pre-folded
    dc_dtype: Optional[str] = None  # run the DC coil-expand/PSF-matmul chain
    # in this dtype (bf16 halves the chain's HBM bytes and doubles its matmul
    # rate; CIRIM wires train_dc_dtype here in train mode and infer_dc_dtype
    # otherwise — both default to compute_dtype, null forces f32)
    pointwise_matmul: bool = False  # lower the cells' 1x1 convs to matmuls
    # (wins in the training step's backward, loses inference fusion — see
    # nn/layers.py Conv)
    lane_fold: bool = False  # run the conv/RNN stack in folded layout
    # [B, H, W/2, 2C] for full MXU lane width (nn/fold.py) — exact, ~2x on
    # the conv stack; hidden states are carried folded

    @nn.compact
    def __call__(self, carry, _, y, sens, mask, sigma, psf_mats=None, psf_z0=None):
        eta, hx = carry
        if self.dc_psf1d:
            if self.dc_dtype is not None:
                d = self.dc_dtype
                x = log_likelihood_gradient_psf1d(
                    eta.astype(d), sens.astype(d), psf_mats.astype(d), psf_z0.astype(d),
                    sigma=sigma, coil_dim=self.coil_dim,
                )
            else:
                x = log_likelihood_gradient_psf1d(
                    eta, sens, psf_mats, psf_z0, sigma=sigma, coil_dim=self.coil_dim
                )
        else:
            x = log_likelihood_gradient(
                eta,
                y,
                sens,
                mask,
                sigma=sigma,
                fft_centered=self.fft_centered,
                fft_normalization=self.fft_normalization,
                spatial_dims=self.spatial_dims,
                coil_dim=self.coil_dim,
            )
        # named for the remat policy: saving the DC gradient avoids
        # recomputing the likelihood-gradient matmul chain in the backward.
        # Saved as [B, H, W*C]: a 4-channel minor dim would be lane-padded to
        # 128 by TPU tiling (32x the bytes for the stored buffer); folding
        # channels into W gives a clean (8, 128) tiling. Pure reshape — exact.
        b_, h_, w_, c_ = x.shape
        x = jax.ad_checkpoint.checkpoint_name(x.reshape(b_, h_, w_ * c_), "dc_grad").reshape(
            b_, h_, w_, c_
        )
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
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
                    self.recurrent_layer,
                    rf,
                    rk,
                    rd,
                    rb,
                    dtype=self.compute_dtype,
                    pointwise_matmul=self.pointwise_matmul,
                    lane_fold=self.lane_fold,
                )
                x = cell(x, hx[h_idx]).astype(hx[h_idx].dtype)
                new_hx.append(x)
                h_idx += 1
            else:
                final = conv
        dx = final(x)
        if self.lane_fold:
            dx = unfold_w(dx)
        eta = eta + dx.astype(eta.dtype)  # [B, H, W, 2]
        return (eta, tuple(new_hx)), (eta if self.stack_etas else None)


class RIMBlock(nn.Module):
    """Cascade block: `time_steps` RIM updates via scan, optional soft DC."""

    recurrent_layer: str = "IndRNN"
    conv_filters: Sequence[int] = (64, 64, 2)
    conv_kernels: Sequence[int] = (5, 3, 3)
    conv_dilations: Sequence[int] = (1, 2, 1)
    conv_bias: Sequence[bool] = (True, True, False)
    recurrent_filters: Sequence[int] = (64, 64, 0)
    recurrent_kernels: Sequence[int] = (1, 1, 0)
    recurrent_dilations: Sequence[int] = (1, 1, 0)
    recurrent_bias: Sequence[bool] = (True, True, False)
    time_steps: int = 8
    no_dc: bool = True
    fft_centered: bool = False
    fft_normalization: str = "backward"
    spatial_dims: Sequence[int] = (-2, -1)
    coil_dim: int = 1
    compute_dtype: Optional[str] = None
    remat: object = True  # time-step rematerialization: True/"step" remats
    # each step (backward recomputes the conv stack instead of storing
    # T x activations); False/"none" stores everything. The flagship CIRIM
    # composes this with an optional cascade-level remat (models/recon/cirim.py
    # remat_mode) — measured trade-offs in docs/performance.md.
    stack_etas: bool = True  # False: etas output is None (inference fast path)
    dc_psf1d: bool = False  # exact DC fast path for 1D (column) masks: the
    # normal operator A^H M A collapses to one per-example [W, W] matmul
    # (see nn/dc.py psf1d_gauss_mats) and A^H M y is hoisted out of the scan
    dc_dtype: Optional[str] = None  # dtype of the DC chain (see _RIMStep)
    eta_dtype: Optional[str] = None  # dtype of the eta carry / stacked etas
    # (train-path knob: bf16 halves their HBM traffic; the DC chain already
    # consumes eta in dc_dtype, so this only perturbs the carry accumulation)
    pointwise_matmul: bool = False  # cells' 1x1 convs as matmuls (train win)
    scan_unroll: int = 1  # lax.scan unroll factor for the time-step loop
    lane_fold: str = "never"  # "auto": fold the conv/RNN stack into 2C
    # channels at W/2 on non-CPU backends (IndRNN only; exact — see
    # nn/fold.py); "always"/"never" force it

    @nn.compact
    def __call__(
        self,
        y: jnp.ndarray,
        sens: jnp.ndarray,
        mask: jnp.ndarray,
        eta: Optional[jnp.ndarray] = None,
        sigma: float = 1.0,
        hx: Optional[Tuple[jnp.ndarray, ...]] = None,
        return_hx: bool = False,
    ):
        """Returns (etas [T, B, H, W, 2], final_eta [B, H, W, 2]) real views,
        plus the final hidden states when ``return_hx`` (MTLRS feature sharing,
        reference multitask/rs/nn/mtlrs.py hx threading)."""
        if eta is None:
            eta = sens_reduce(
                y, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
            )
        if self.eta_dtype is not None:
            eta = eta.astype(self.eta_dtype)
        b, h, w = eta.shape[0], eta.shape[1], eta.shape[2]
        fold = self.lane_fold == "always" or (
            self.lane_fold == "auto"
            and jax.default_backend() != "cpu"
            and self.recurrent_layer.upper() == "INDRNN"
            and w % 2 == 0
        )
        hx_dtype = self.compute_dtype or jnp.float32
        if hx is None:
            hx_shape = (b, h, w // 2, None) if fold else (b, h, w, None)
            hx = tuple(
                jnp.zeros((*hx_shape[:3], 2 * f if fold else f), hx_dtype)
                for f in self.recurrent_filters
                if f != 0
            )
        else:
            hx = tuple(h_.astype(hx_dtype) for h_ in hx)

        psf_mats = psf_z0 = None
        if self.dc_psf1d:
            # mask is [B, 1, H, W] (or H-broadcastable); a 1D mask's rows are
            # identical, so row 0 defines the whole operator.
            mask_row = mask[:, 0, 0, :]
            psf_mats = psf1d_gauss_mats(mask_row, self.fft_centered, self.fft_normalization)
            psf_z0 = sens_reduce(
                expand_rv_mask(mask) * y,
                sens,
                self.fft_centered,
                self.fft_normalization,
                self.spatial_dims,
                self.coil_dim,
            )

        if self.remat is True or self.remat == "step":
            # store each step's DC gradient ([B, H, W, 4] — small next to the
            # hidden states) so the backward's step recompute skips the DC
            # matmul chain; everything else is rematerialized as before
            policy = jax.checkpoint_policies.save_only_these_names("dc_grad")
            step_cls = nn.remat(_RIMStep, prevent_cse=False, policy=policy)
        else:
            step_cls = _RIMStep
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast,) * 7,
            out_axes=0,
            length=self.time_steps,
            unroll=self.scan_unroll,
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
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            spatial_dims=self.spatial_dims,
            coil_dim=self.coil_dim,
            compute_dtype=self.compute_dtype,
            stack_etas=self.stack_etas,
            dc_psf1d=self.dc_psf1d,
            dc_dtype=self.dc_dtype,
            pointwise_matmul=self.pointwise_matmul,
            lane_fold=fold,
        )
        (eta, hx_out), etas = scan((eta, hx), None, y, sens, mask, sigma, psf_mats, psf_z0)

        if self.no_dc:
            if return_hx:
                return etas, eta, hx_out
            return etas, eta

        # soft-DC variant: project each eta back to k-space with learned weight
        dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))
        pred_k = sens_expand(eta, sens, self.fft_centered, self.fft_normalization, self.spatial_dims)
        current_kspace = y - soft_dc(pred_k, y, mask, dc_weight) - pred_k
        eta_dc = sens_reduce(
            current_kspace, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
        )
        if return_hx:
            return etas, eta_dc, hx_out
        return etas, eta_dc
