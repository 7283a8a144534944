"""SSIM training loss (jnp, jittable).

Functional parity with reference: mridc/collections/common/losses/ssim.py:11-61
(fastMRI SSIMLoss: uniform 7x7 window, k1=0.01, k2=0.03, returns ``1 - SSIM``,
VALID convolution so edges are cropped like the reference's unpadded conv2d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["SSIMLoss", "ssim_loss"]


def _uniform_filter_valid(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean filter via VALID depthwise conv over [B, 1, H, W]."""
    w = jnp.ones((1, 1, win, win), x.dtype) / (win * win)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )


def ssim_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: jnp.ndarray,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """``1 - mean(SSIM)`` over [batch, channels, h, w] inputs.

    ``data_range`` has shape [batch] (one range per element, like the
    reference's ``data_range[:, None, None, None]``).
    """
    if x.ndim == 3:
        x = x[:, None]
    if y.ndim == 3:
        y = y[:, None]
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    data_range = jnp.asarray(data_range, jnp.float32).reshape(-1, 1, 1, 1)

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ux = _uniform_filter_valid(x, win_size)
    uy = _uniform_filter_valid(y, win_size)
    uxx = _uniform_filter_valid(x * x, win_size)
    uyy = _uniform_filter_valid(y * y, win_size)
    uxy = _uniform_filter_valid(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux**2 + uy**2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return 1 - s.mean()


class SSIMLoss:
    """Callable wrapper matching the reference module's signature."""

    def __init__(self, win_size: int = 7, k1: float = 0.01, k2: float = 0.03):
        self.win_size = win_size
        self.k1 = k1
        self.k2 = k2

    def __call__(self, x, y, data_range):
        return ssim_loss(x, y, data_range, self.win_size, self.k1, self.k2)
