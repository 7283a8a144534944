"""Host-side reconstruction evaluation metrics.

Functional parity with reference:
mridc/collections/reconstruction/metrics/reconstruction_metrics.py
(``mse`` :11, ``nmse`` :41, ``psnr`` :72, ``ssim`` :113,
``ReconstructionMetrics`` :... running statistics).

The reference delegates PSNR/SSIM to scikit-image; skimage is not available
here, so both are re-implemented to match skimage's definitions exactly:
``peak_signal_noise_ratio`` is ``10*log10(range^2/mse)`` and
``structural_similarity`` uses the default 7x7 uniform window, K1=0.01,
K2=0.03, sample-covariance normalization, and edge cropping by the filter
radius. Verified against the published formulas; parity with skimage is to
float precision.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
from scipy import ndimage

__all__ = ["mse", "nmse", "psnr", "ssim", "METRIC_FUNCS", "ReconstructionMetrics", "RunningStat"]


def mse(x: np.ndarray, y: np.ndarray) -> float:
    """Mean squared error."""
    return float(np.mean((x - y) ** 2))


def nmse(x: np.ndarray, y: np.ndarray) -> float:
    """Normalized MSE: ||x - y||^2 / ||x||^2."""
    return float(np.linalg.norm(x - y) ** 2 / np.linalg.norm(x) ** 2)


def psnr(x: np.ndarray, y: np.ndarray, maxval: Optional[float] = None) -> float:
    """Peak SNR with skimage semantics (data_range defaults to x.max())."""
    if maxval is None:
        maxval = float(np.max(x))
    err = mse(x, y)
    if err == 0:
        return float("inf")
    if maxval <= 0:
        return float("-inf")  # skimage returns -inf for a zero data range
    return float(10 * math.log10((maxval**2) / err))


def _ssim_2d(x: np.ndarray, y: np.ndarray, data_range: float, win_size: int = 7, k1=0.01, k2=0.03) -> float:
    """skimage.structural_similarity, gaussian_weights=False path."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    if min(x.shape) < win_size:
        win_size = min(x.shape) // 2 * 2 - 1
        win_size = max(win_size, 3)
        if win_size > min(x.shape):  # degenerate 1-2 pixel extent: SSIM of the
            # means only (an empty edge-crop would silently return NaN)
            mu_x, mu_y = x.mean(), y.mean()
            c1 = (k1 * data_range) ** 2
            return float((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1))
    NP = win_size ** x.ndim
    cov_norm = NP / (NP - 1)

    filt = lambda a: ndimage.uniform_filter(a, size=win_size)  # noqa: E731
    ux = filt(x)
    uy = filt(y)
    uxx = filt(x * x)
    uyy = filt(y * y)
    uxy = filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux**2 + uy**2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return float(s[pad:-pad or None, pad:-pad or None].mean())


def ssim(x: np.ndarray, y: np.ndarray, maxval: Optional[float] = None) -> float:
    """Mean per-slice SSIM over a [slices, h, w] volume (reference :113-160)."""
    if x.ndim != 3:
        raise ValueError("Unexpected number of dimensions in ground truth.")
    if x.ndim != y.ndim:
        raise ValueError("Ground truth dimensions does not match prediction dimensions.")
    maxval = float(np.max(x)) if maxval is None else float(maxval)
    return float(np.mean([_ssim_2d(x[s], y[s], maxval) for s in range(x.shape[0])]))


METRIC_FUNCS = {"MSE": mse, "NMSE": nmse, "PSNR": psnr, "SSIM": ssim}


class RunningStat:
    """Welford running mean/stddev (replaces the reference's runstats dep)."""

    def __init__(self):
        self.n = 0
        self._mean = 0.0
        self._m2 = 0.0

    def push(self, v: float):
        self.n += 1
        d = v - self._mean
        self._mean += d / self.n
        self._m2 += d * (v - self._mean)

    def mean(self) -> float:
        return self._mean

    def stddev(self) -> float:
        return math.sqrt(self._m2 / (self.n - 1)) if self.n > 1 else 0.0


class ReconstructionMetrics:
    """Running statistics over a metric dict (reference evaluate harness,
    projects/unselfsupervised/evaluate_reconstruction.py:12-50)."""

    def __init__(self, metric_funcs: Dict = None):
        self.metric_funcs = metric_funcs or METRIC_FUNCS
        self.metrics_scores = {m: RunningStat() for m in self.metric_funcs}

    def push(self, x: np.ndarray, y: np.ndarray):
        for metric, func in self.metric_funcs.items():
            self.metrics_scores[metric].push(func(x, y))

    def means(self) -> Dict[str, float]:
        return {m: s.mean() for m, s in self.metrics_scores.items()}

    def stddevs(self) -> Dict[str, float]:
        return {m: s.stddev() for m, s in self.metrics_scores.items()}

    def __repr__(self):
        means, stds = self.means(), self.stddevs()
        return " ".join(f"{k} = {means[k]:.4g} +/- {2 * stds[k]:.4g}" for k in sorted(means)) + "\n"
