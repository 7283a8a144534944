"""Quantitative (multi-echo) preprocessing: map initialization + transforms.

Functional parity with reference:
mridc/collections/quantitative/parts/transforms.py (``qMRIDataTransforms`` :21,
``precompute_quantitative_maps`` :553-589 — least-squares fits over the echo
train, phase unwrapping) and qrim/utils.py's
``R2star_B0_real_S0_complex_mapping``.

Phase unwrapping uses our numpy implementation of skimage's own algorithm
(Herraez reliability-sorted region merging, mridc_tpu/ops/unwrap.py) —
algorithmic parity with the reference's ``skimage.restoration.unwrap_phase``.
The previous Ghiglia–Romero DCT Poisson solver remains available as
``unwrap_phase_dct`` (least-squares approximation).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
from scipy.fft import dctn, idctn

from mridc_tpu.data.transforms import MRIDataTransforms, _np_ifft2

from mridc_tpu.ops.unwrap import unwrap_phase_2d  # noqa: F401 (Herraez, skimage-equivalent)

__all__ = ["unwrap_phase_2d", "unwrap_phase_dct", "fit_quantitative_maps", "qMRIDataTransforms"]

SCALING = 1e-3


def unwrap_phase_dct(phase: np.ndarray) -> np.ndarray:
    """Ghiglia-Romero DCT-based 2D phase unwrapping (least-squares)."""
    h, w = phase.shape

    def wrap(x):
        return np.angle(np.exp(1j * x))

    dy = wrap(np.vstack([np.diff(phase, axis=0), np.zeros((1, w))]))
    dx = wrap(np.hstack([np.diff(phase, axis=1), np.zeros((h, 1))]))
    rho = np.vstack([dy[:1], np.diff(dy, axis=0)]) + np.hstack([dx[:, :1], np.diff(dx, axis=1)])

    dct_rho = dctn(rho, norm="ortho")
    yy, xx = np.mgrid[:h, :w]
    denom = 2 * (np.cos(np.pi * yy / h) + np.cos(np.pi * xx / w) - 2)
    denom[0, 0] = 1.0
    phi = dct_rho / denom
    phi[0, 0] = 0.0
    out = idctn(phi, norm="ortho")
    # the Poisson solve loses the absolute offset; restore it circularly so the
    # temporal phase evolution (B0) survives for spatially smooth phases
    offset = np.angle(np.exp(1j * (phase - out)).mean())
    return (out + offset).astype(np.float32)


def fit_quantitative_maps(
    echo_images: np.ndarray,
    tes: Sequence[float],
    mask_brain: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Least-squares init of (R2*, S0, B0, phi) from multi-echo images.

    echo_images: [E, H, W] complex; tes in ms (reference scaling 1e-3).
    Magnitude: log-linear fit -> R2*, |S0|; phase: linear fit of unwrapped
    phase over TEs -> B0 (slope), phi (intercept treated as the imaginary S0
    component, matching the reference's complex-S0 convention).
    """
    tes = np.asarray(tes, np.float64) * SCALING
    e = len(tes)
    mag = np.abs(echo_images).astype(np.float64) + 1e-8
    logm = np.log(mag)

    # weighted least squares over echoes: log|S| = log|S0| - TE * R2*
    t_mean = tes.mean()
    t_var = ((tes - t_mean) ** 2).sum()
    slope = ((tes - t_mean)[:, None, None] * (logm - logm.mean(0))).sum(0) / t_var
    r2star = np.clip(-slope, 0, None)
    log_s0 = logm.mean(0) - slope * t_mean
    s0 = np.exp(log_s0)

    phases = np.stack([unwrap_phase_2d(np.angle(echo_images[i])) for i in range(e)])
    ph_slope = ((tes - t_mean)[:, None, None] * (phases - phases.mean(0))).sum(0) / t_var
    b0 = -ph_slope  # signal model rotates by exp(-i TE s B0)
    phi0 = phases.mean(0) - ph_slope * t_mean
    # complex S0 split (reference: S0_real = |S0| cos(phi), S0_imag = |S0| sin(phi))
    s0_real = s0 * np.cos(phi0)
    s0_imag = s0 * np.sin(phi0)

    maps = {
        "R2star_map": r2star.astype(np.float32),
        "S0_map": s0_real.astype(np.float32),
        "B0_map": b0.astype(np.float32),
        "phi_map": s0_imag.astype(np.float32),
    }
    if mask_brain is not None:
        for k in maps:
            maps[k] = maps[k] * np.asarray(mask_brain, np.float32)
    return maps


class qMRIDataTransforms(MRIDataTransforms):
    """Multi-echo transform pipeline: applies the base pipeline per echo and
    precomputes the quantitative map initialization (reference
    quantitative/parts/transforms.py:21)."""

    def __init__(self, TEs: Sequence[float], precompute_quantitative_maps: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.TEs = list(TEs)
        self.precompute_quantitative_maps = precompute_quantitative_maps

    def __call__(self, kspace, sensitivity_map, mask, *args, **kwargs):
        """kspace: [E, C, H, W] complex. Returns the base 10-tuple plus a dict
        of initial quantitative maps appended to attrs."""
        echoes = []
        out = None
        for e in range(kspace.shape[0]):
            out = super().__call__(kspace[e], sensitivity_map, mask, *args, **kwargs)
            echoes.append(out)
        # stack per-echo outputs along a leading echo axis where arraylike
        (k, mk, s, m, pred, tgt, fname, sidx, acc, attrs) = echoes[0]
        kspaces = np.stack([e[0] for e in echoes], 0)
        masked = [np.stack([e[1][i] for e in echoes], 0) for i in range(len(mk))] if isinstance(mk, list) else np.stack([e[1] for e in echoes], 0)
        preds = [np.stack([np.asarray(e[4][i]) for e in echoes], 0) for i in range(len(pred))] if isinstance(pred, list) else np.stack([np.asarray(e[4]) for e in echoes], 0)
        targets = np.stack([np.asarray(e[5]) for e in echoes], 0)

        if self.precompute_quantitative_maps:
            echo_imgs = _np_ifft2(kspaces, self.fft_centered, self.fft_normalization, self.spatial_dims)
            combined = (echo_imgs * np.conj(s)[None]).sum(axis=1)
            attrs = dict(attrs)
            attrs["quantitative_maps_init"] = fit_quantitative_maps(combined, self.TEs)
            attrs["TEs"] = list(self.TEs)

        return (kspaces, masked, s, m, preds, targets, fname, sidx, acc, attrs)
