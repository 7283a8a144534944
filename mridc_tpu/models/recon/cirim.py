"""Cascades of Independently Recurrent Inference Machines — the flagship model.

Functional parity with reference:
mridc/collections/reconstruction/nn/cirim.py:21 (cascade loop :110-127,
generator semantics replaced by stacked scan outputs) and
rim/rim_block.py:12. The per-cascade hidden state resets (the reference passes
``hx=None`` into every cascade, cirim.py:108-121); with ``no_dc`` (default) the
estimate flows through cascades in image space.

TPU design: time steps run under `lax.scan` (one trace of the conv/GRU stack);
cascades are separate-weight blocks in a python loop; all FFTs are native
complex XLA TPU FFTs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, check_dc_mode, expand_mask
from mridc_tpu.nn.rim import RIMBlock

__all__ = ["CIRIM"]


class CIRIM(BaseReconModel):
    recurrent_layer: str = "IndRNN"
    conv_filters: Sequence[int] = (64, 64, 2)
    conv_kernels: Sequence[int] = (5, 3, 3)
    conv_dilations: Sequence[int] = (1, 2, 1)
    conv_bias: Sequence[bool] = (True, True, False)
    recurrent_filters: Sequence[int] = (64, 64, 0)
    recurrent_kernels: Sequence[int] = (1, 1, 0)
    recurrent_dilations: Sequence[int] = (1, 1, 0)
    recurrent_bias: Sequence[bool] = (True, True, False)
    depth: int = 2
    time_steps: int = 8
    num_cascades: int = 5
    no_dc: bool = True
    keep_prediction: bool = True
    compute_dtype: str = None
    stack_intermediates: bool = True  # False: inference fast path — skip
    # stacking cascades x T per-step predictions (saves HBM traffic/footprint)
    lane_fold: str = "auto"  # fold the conv/RNN stack to full MXU lane
    # width on TPU (exact; nn/fold.py). "auto" | "always" | "never".
    dc_mode: str = "full"  # "psf1d": exact DC fast path when the sampling
    # mask is 1D along the phase-encode axis (fastMRI-style column masks) —
    # the 2D fwd+inv FFT pair per RIM step collapses to one [W, W] matmul
    # (nn/dc.py psf1d_gauss_mats). Caller asserts the mask really is 1D.
    train_pointwise_matmul: bool = True  # lower the cells' 1x1 convs to
    # matmuls in train mode (measured +13% pre-lane-folding; re-measured per
    # round in docs/performance.md)
    train_dc_dtype: str = None  # dtype for the psf1d DC chain in TRAIN mode
    # (bf16 halves the coil-expand/PSF bytes and doubles the matmul rate in
    # fwd+bwd: 6.2 -> 9.9 slices/s on v5e, grad cosine 0.9996 vs f32; the
    # inference twin is infer_dc_dtype below). from_config defaults it to
    # compute_dtype — set train_dc_dtype: null explicitly to force f32 DC
    # in training.
    train_eta_dtype: str = None  # dtype of the eta carry/stack in TRAIN
    # mode only (opt-in; see nn/rim.py eta_dtype)
    infer_dc_dtype: str = None  # dtype for the psf1d DC chain at INFERENCE
    # (halves the coil-tensor HBM traffic and runs the PSF matmuls
    # single-pass: 62.6 -> 81.0 slices/s on v5e with the SSIM-vs-f32
    # certificate unchanged at 1.000000, rel l2 1.1e-4 vs the f32 fast
    # path's 9.5e-5 — docs/performance.md). from_config defaults it to
    # compute_dtype; set infer_dc_dtype: null explicitly to force f32 DC.
    scan_unroll: int = 1  # time-step scan unroll factor
    remat_mode: str = "step+cascade"  # training rematerialization:
    # "step+cascade" (round-2 default: remat each time step AND each cascade
    # — forward runs 3x per train step), "cascade" (remat cascades only: the
    # active cascade's backward stores its step activations — one fewer
    # forward execution, more HBM), "step", "none". Measured on v5e in
    # docs/performance.md.
    remat_save_dc: bool = False  # with cascade remat: save the named per-step
    # 'dc_grad' activations across the CASCADE remat too, so the cascade
    # backward's forward recompute skips the DC matmul chain entirely (DC runs
    # fwd x1 instead of x2 per train step) at the cost of storing
    # cascades x T x [B, H, W, 4] likelihood gradients. Opt-in pending a
    # measured win (docs/performance.md).

    @classmethod
    def from_config(cls, cfg):
        # Honor the configured T exactly: scan length does not constrain TPU
        # tiling, and rounding T up would change both the compute and the
        # logspace(-1, 0, T) loss weighting (reference cirim.py:356-358).
        time_steps = int(cfg.get("time_steps", 8))
        remat_mode = str(cfg.get("remat_mode", "step+cascade")).lower()
        if remat_mode not in ("step+cascade", "cascade", "step", "none"):
            raise ValueError(
                "remat_mode must be one of 'step+cascade' | 'cascade' | 'step' | 'none', "
                f"got {remat_mode!r}"
            )
        return cls(
            recurrent_layer=cfg.get("recurrent_layer", "IndRNN"),
            conv_filters=tuple(cfg.get("conv_filters", (64, 64, 2))),
            conv_kernels=tuple(cfg.get("conv_kernels", (5, 3, 3))),
            conv_dilations=tuple(cfg.get("conv_dilations", (1, 2, 1))),
            conv_bias=tuple(cfg.get("conv_bias", (True, True, False))),
            recurrent_filters=tuple(cfg.get("recurrent_filters", (64, 64, 0))),
            recurrent_kernels=tuple(cfg.get("recurrent_kernels", (1, 1, 0))),
            recurrent_dilations=tuple(cfg.get("recurrent_dilations", (1, 1, 0))),
            recurrent_bias=tuple(cfg.get("recurrent_bias", (True, True, False))),
            depth=cfg.get("depth", 2),
            time_steps=time_steps,
            num_cascades=cfg.get("num_cascades", 5),
            no_dc=cfg.get("no_dc", True),
            keep_prediction=cfg.get("keep_prediction", cfg.get("keep_eta", True)),
            compute_dtype=cfg.get("compute_dtype", None),
            stack_intermediates=cfg.get("stack_intermediates", True),
            dc_mode=check_dc_mode(str(cfg.get("dc_mode", "full")).lower()),
            remat_mode=remat_mode,
            remat_save_dc=bool(cfg.get("remat_save_dc", False)),
            train_dc_dtype=(
                cfg["train_dc_dtype"] if "train_dc_dtype" in cfg else cfg.get("compute_dtype")
            ),
            train_pointwise_matmul=bool(cfg.get("train_pointwise_matmul", True)),
            train_eta_dtype=cfg.get("train_eta_dtype"),
            infer_dc_dtype=(
                cfg["infer_dc_dtype"] if "infer_dc_dtype" in cfg else cfg.get("compute_dtype")
            ),
            scan_unroll=int(cfg.get("scan_unroll", 1)),
            lane_fold=str(cfg.get("lane_fold", "auto")).lower(),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        mask = expand_mask(mask)
        block_cfg = dict(
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
            no_dc=self.no_dc,
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            spatial_dims=self.spatial_dims,
            coil_dim=self.coil_dim,
            compute_dtype=self.compute_dtype,
            stack_etas=self.stack_intermediates,
            dc_psf1d=self.dc_mode == "psf1d",
            dc_dtype=self.train_dc_dtype if train else self.infer_dc_dtype,
            eta_dtype=self.train_eta_dtype if train else None,
            scan_unroll=self.scan_unroll,
            remat="step" if "step" in self.remat_mode else "none",
            lane_fold=self.lane_fold,
            # the matmul lowering of the cells' 1x1 convs wins in the training
            # step (backward) but breaks inference fusion; params identical
            # either way, so keying it on `train` is checkpoint-safe.
            pointwise_matmul=train and self.train_pointwise_matmul,
        )
        have_init = init_pred is not None and init_pred.ndim >= 4
        eta0 = init_pred if have_init else self.sense_init(y, sens)
        if train and self.train_eta_dtype is not None:
            eta0 = eta0.astype(self.train_eta_dtype)

        # Cascades carry independent weights but identical structure: scan with
        # params split over the cascade axis, so the RIM block is traced ONCE
        # regardless of num_cascades (compile-time win on TPU; the reference
        # python-loops a ModuleList, cirim.py:110-127).
        #
        # Reference chaining semantics (rim_block.py:202,226-242 + cirim.py:110):
        #   - a provided init_pred is used as the eta of EVERY cascade (the
        #     loop never reassigns it);
        #   - otherwise cascade 0 SENSE-inits from y, and later cascades start
        #     from the previous cascade's final eta DETACHED (pred[-1].detach()
        #     — no gradient across cascades through the estimate);
        #   - with keep_prediction=False later cascades re-init from the
        #     zero-filled SENSE recon instead.
        keep = self.keep_prediction

        class _Cascade(nn.Module):
            @nn.compact
            def __call__(self, carry, _, y, sens, mask):
                eta = carry
                etas, eta_final = RIMBlock(**block_cfg)(y, sens, mask, eta=eta)
                if have_init or not keep:
                    next_eta = eta  # constant init (init_pred or SENSE re-init)
                else:
                    next_eta = jax.lax.stop_gradient(eta_final)
                return next_eta, (etas, eta_final)

        # remat each cascade as well (remat_mode): the time-step scan's
        # carries (large hidden states) are then only stored for the
        # cascade being re-executed in backward, not all cascades at once.
        if "cascade" in self.remat_mode:
            cascade_policy = (
                jax.checkpoint_policies.save_only_these_names("dc_grad")
                if self.remat_save_dc
                else None
            )
            cascade_cls = nn.remat(_Cascade, prevent_cse=False, policy=cascade_policy)
        else:
            cascade_cls = _Cascade
        scan = nn.scan(
            cascade_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=self.num_cascades,
        )()
        _, (intermediates, finals) = scan(eta0, None, y, sens, mask)
        if not self.stack_intermediates:
            return ModelOutput(prediction=finals[-1], intermediates=None)
        # intermediates: [cascades, T, B, H, W, 2]
        return ModelOutput(prediction=intermediates[-1, -1], intermediates=intermediates)
