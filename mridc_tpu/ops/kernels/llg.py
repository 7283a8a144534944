"""Fused Pallas kernel for the RIM log-likelihood-gradient / DC chain.

The hot op of every unrolled model (SURVEY §3.1 HOT LOOP):
    eta -> (x sens) -> FFT -> mask*(k - y) -> IFFT -> (x conj(sens)) -> sum_c

The XLA path (mridc_tpu/nn/dc.py) materializes [B, C, H, W, 2] intermediates in
HBM between the DFT matmul passes; this kernel keeps one (batch, coil) tile
VMEM-resident end-to-end: complex DFT passes as in-kernel MXU matmuls against
the constant (shift-folded) DFT matrices, elementwise mask/residual in VMEM,
and coil accumulation via sequential grid revisiting of the output block.

VMEM economy: only the *forward* ortho DFT matrices ship to the kernel — the
transform is unitary, so the inverse pass reuses them as conjugate transposes.

Grid: (B, C) — TPU grids iterate sequentially, so out[b] accumulates across
the coil dimension with a zero-init on c == 0. Requires ortho normalization
(the unitary case); other norms fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mridc_tpu.ops.fft import _dft_mats

__all__ = ["llg_fused"]


def _kernel(eta_ref, y_ref, sens_ref, mask_ref, fh_ref, fw_ref, out_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    er = eta_ref[0, :, :, 0]
    ei = eta_ref[0, :, :, 1]
    sr = sens_ref[0, :, :, 0]
    si = sens_ref[0, :, :, 1]
    xr = er * sr - ei * si
    xi = er * si + ei * sr

    # HIGHEST: full-f32 MXU passes — default bf16 multiplies give ~8e-2
    # error on the DFT matrices (measured on v5e), far beyond tolerance
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    fhr, fhi = fh_ref[0], fh_ref[1]
    fwr, fwi = fw_ref[0], fw_ref[1]

    # forward: rows (M @ x) then cols (t @ M^T)
    tr = dot(fhr, xr) - dot(fhi, xi)
    ti = dot(fhr, xi) + dot(fhi, xr)
    kr = dot(tr, fwr.T) - dot(ti, fwi.T)
    ki = dot(tr, fwi.T) + dot(ti, fwr.T)

    m = mask_ref[0]
    rr = m * (kr - y_ref[0, :, :, 0])
    ri = m * (ki - y_ref[0, :, :, 1])

    # inverse of the unitary transform: M^{-1} = conj(M)^T
    tr = dot(fhr.T, rr) + dot(fhi.T, ri)
    ti = dot(fhr.T, ri) - dot(fhi.T, rr)
    gr = dot(tr, fwr) + dot(ti, fwi)
    gi = dot(ti, fwr) - dot(tr, fwi)

    out_ref[0, :, :, 0] += gr * sr + gi * si
    out_ref[0, :, :, 1] += gi * sr - gr * si


def llg_fused(
    eta: jnp.ndarray,
    y: jnp.ndarray,
    sens: jnp.ndarray,
    mask: jnp.ndarray,
    fft_centered: bool = True,
    fft_normalization: str = "ortho",
) -> jnp.ndarray:
    """Fused gradient sum_c S_c^H F^H M (F S_c eta - y_c) -> [B, H, W, 2].

    eta [B, H, W, 2]; y/sens [B, C, H, W, 2]; mask broadcastable [B, 1, H, W].
    Requires fft_normalization == 'ortho' (unitary inverse reuse).
    """
    if fft_normalization != "ortho":
        raise ValueError("llg_fused requires ortho normalization; use the XLA path otherwise.")
    b, c_, h, w, _ = y.shape
    mask = jnp.broadcast_to(mask.reshape(b, 1, h, w) if mask.ndim != 4 else mask, (b, 1, h, w))
    y4 = y.reshape(b * c_, h, w, 2)
    s4 = sens.reshape(b * c_, h, w, 2)

    fh = jnp.stack(_dft_mats(h, False, fft_centered, fft_normalization))
    fw = jnp.stack(_dft_mats(w, False, fft_centered, fft_normalization))

    return pl.pallas_call(
        _kernel,
        grid=(b, c_),
        in_specs=[
            pl.BlockSpec((1, h, w, 2), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 2), lambda i, j: (i * c_ + j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 2), lambda i, j: (i * c_ + j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, h), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, w, w), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, 2), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 2), jnp.float32),
        # the default scoped-vmem budget is 16MB; the HIGHEST-precision DFT
        # matmul temporaries need ~2MB per 64x64 tile and grow ~quadratically
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(eta, y4, s4, mask.reshape(b, h, w), fh, fw)
