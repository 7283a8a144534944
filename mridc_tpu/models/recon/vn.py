"""End-to-end Variational Network (reference: mridc/collections/reconstruction/nn/vn.py:19,
varnet/vn_block.py:11).

Cascades of (soft DC + NormUnet regularizer) in k-space. Cascades have
independent weights and run as a python loop of blocks (static count), each
block = sens_reduce -> NormUnet -> sens_expand with a learned DC weight.

TPU fast path (``dc_mode: psf1d``) — exact for 1D (column) sampling masks:
the k-space recursion  pred_{i+1} = pred_i − w_i·M(pred_i − y) − F S u_i
(u_i = NormUnet(sens_reduce(pred_i))) stays inside the linear span of
{F S u_j, M F S u_j}, so the forward never needs pred itself — only its
sens-reduced image. Writing e_i = pred_i − y = Σ_j α_ij F S u_j +
β_ij M F S u_j, one cascade updates the coefficients as
    β'_j = β_j − w_i (α_j + β_j);   α'_i = −1  (new term −F S u_i)
and the network input is x_i = sens_reduce(y) + Σ_j α_ij ρ u_j + β_ij q_j,
where ρ = Σ_c |s_c|² (since sens_reduce(F S u) = ρ·u) and
q_j = Σ_c s_c^* C_w (s_c u_j) uses the PSF-1D normal operator
C_w = F_w^{-1} diag(m) F_w (nn/dc.py psf1d_gauss_mats). Tracking the running
sums R = Σ α_j ρ u_j, A = Σ α_j q_j, B = Σ β_j q_j replaces the per-cascade
forward+inverse 2D FFT pair over all coils with ONE [W, W] matmul chain —
4x fewer DC FLOPs and 15x less k-space elementwise traffic, exactly
(fp reassociation only). Parameters are identical to the full path
(same blocks, same names), so checkpoints and same-weight A/Bs carry over.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, check_dc_mode, expand_mask
from mridc_tpu.nn.dc import apply_psf1d, psf1d_gauss_mats, sens_expand, sens_reduce, soft_dc
from mridc_tpu.nn.unet import NormUnet
from mridc_tpu.ops.cplx import ccombine, cmul, cmul_conj
from mridc_tpu.ops.fft import ifft2_rv

__all__ = ["VarNet"]


class _VarNetBlock(BaseReconModel):
    channels: int = 18
    pooling_layers: int = 4
    padding_size: int = 11
    normalize: bool = True
    no_dc: bool = False
    compute_dtype: str = None  # NormUnet conv compute dtype (bf16: params
    # stay f32, norm stats f32; the DC/FFT chain stays f32)
    dc_dtype: str = None  # psf1d DC-chain dtype (bf16 halves the coil-tensor
    # HBM traffic; f32 default — quality certified per-dtype in bench.py)

    def _unet(self, x, train):
        return NormUnet(
            chans=self.channels,
            num_pools=self.pooling_layers,
            padding_size=self.padding_size,
            normalize=self.normalize,
            dtype=self.compute_dtype,
        )(x, train)

    @nn.compact
    def __call__(self, pred, ref_kspace, sens, mask, train: bool = False, psf1d_ops=None):
        dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))
        if psf1d_ops is not None:
            # reduced-state cascade (see module docstring): ``pred`` is the
            # (x, R, A, B) state, ``ref_kspace`` is x_y; parameter creation
            # order matches the full path, so both share one checkpoint tree
            rho, mats = psf1d_ops
            x, run_r, run_a, run_b = pred
            u = self._unet(x, train)
            dt = self.dc_dtype
            uc, sc = (u, sens) if dt is None else (u.astype(dt), sens.astype(dt))
            coil = cmul(jnp.expand_dims(uc, self.coil_dim), sc)
            filt = apply_psf1d(coil, mats if dt is None else mats.astype(dt))
            q = cmul_conj(filt, sc).sum(axis=self.coil_dim).astype(jnp.float32)
            run_b = run_b - dc_weight * (run_a + run_b)
            run_a = run_a - q
            run_r = run_r - rho * u
            return ref_kspace + run_r + run_b, run_r, run_a, run_b
        dc = soft_dc(pred, ref_kspace, mask, dc_weight)
        x = sens_reduce(
            pred, sens, self.fft_centered, self.fft_normalization, self.spatial_dims, self.coil_dim
        )
        x = self._unet(x, train)
        model_term = sens_expand(
            x, sens, self.fft_centered, self.fft_normalization, self.spatial_dims
        )
        if self.no_dc:
            return model_term
        return pred - dc - model_term


class VarNet(BaseReconModel):
    num_cascades: int = 8
    channels: int = 18
    pooling_layers: int = 4
    padding_size: int = 11
    normalize: bool = True
    no_dc: bool = False
    compute_dtype: str = None
    dc_mode: str = "full"  # "psf1d": exact DC fast path for 1D column masks
    # (fastMRI-style); requires no_dc=False and SENSE combination. Caller
    # asserts the mask really is 1D (constant along H).
    dc_dtype: str = None

    @classmethod
    def from_config(cls, cfg):
        dc_mode = check_dc_mode(str(cfg.get("dc_mode", "full")).lower())
        no_dc = cfg.get("no_dc", False)
        comb = str(cfg.get("coil_combination_method", "SENSE")).upper()
        if dc_mode == "psf1d" and (no_dc or comb != "SENSE"):
            raise ValueError(
                "VarNet dc_mode=psf1d requires no_dc=false and "
                f"coil_combination_method=SENSE (got no_dc={no_dc}, {comb})"
            )
        return cls(
            num_cascades=cfg.get("num_cascades", 8),
            channels=cfg.get("channels", 18),
            pooling_layers=cfg.get("pooling_layers", 4),
            padding_size=cfg.get("padding_size", 11),
            normalize=cfg.get("normalize", True),
            no_dc=no_dc,
            compute_dtype=cfg.get("compute_dtype", None),
            dc_mode=dc_mode,
            dc_dtype=cfg.get("dc_dtype", None),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=comb,
        )

    def _block(self):
        return dict(
            channels=self.channels,
            pooling_layers=self.pooling_layers,
            padding_size=self.padding_size,
            normalize=self.normalize,
            no_dc=self.no_dc,
            compute_dtype=self.compute_dtype,
            dc_dtype=self.dc_dtype,
            fft_centered=self.fft_centered,
            fft_normalization=self.fft_normalization,
            spatial_dims=self.spatial_dims,
            coil_dim=self.coil_dim,
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred
        mask = expand_mask(mask)
        if self.dc_mode == "psf1d":
            # 1D masks are constant along H: row 0 is the mask
            mask_row = jnp.broadcast_to(mask, mask.shape[:2] + y.shape[-3:-1])[:, 0, 0, :]
            mats = psf1d_gauss_mats(mask_row, self.fft_centered, self.fft_normalization)
            x_y = self.sense_init(y, sens)
            rho = (sens[..., 0] ** 2 + sens[..., 1] ** 2).sum(axis=self.coil_dim)[..., None]
            zero = jnp.zeros_like(x_y)
            state = (x_y, zero, zero, zero)
            for _ in range(self.num_cascades):
                state = _VarNetBlock(**self._block())(
                    state, x_y, sens, None, train, psf1d_ops=(rho, mats)
                )
            return ModelOutput(prediction=state[0])
        pred = y
        for _ in range(self.num_cascades):
            pred = _VarNetBlock(**self._block())(pred, y, sens, mask, train)
        image = ifft2_rv(pred, self.fft_centered, self.fft_normalization, self.spatial_dims)
        prediction = ccombine(image, sens, self.coil_combination_method, self.coil_dim)
        return ModelOutput(prediction=prediction)
