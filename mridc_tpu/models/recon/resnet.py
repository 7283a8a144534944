"""ResNet with conjugate-gradient DC + ProximalGradient (SSDU default models).

Functional parity with reference:
mridc/collections/reconstruction/nn/resnet_base/resnet_block.py
(``ResidualNetwork`` :12, ``ConjugateGradient`` :57),
nn/resnet.py:19 and nn/proximal_gradient.py:19.

The CG solve runs as a `lax.fori_loop` over real-view complex arrays; complex
scalars (dot products, alpha/beta) are carried as (re, im) pairs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, expand_mask
from mridc_tpu.ops.cplx import cmul, cmul_conj
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["ResidualNetwork", "conjugate_gradient", "ResNet", "ProximalGradient"]


class ResidualNetwork(nn.Module):
    """Scaled residual conv blocks (reference resnet_block.py:12-55)."""

    nb_res_blocks: int = 15
    channels: int = 64
    regularization_factor: float = 0.1
    dtype: str = None  # opt-in bf16 conv compute; params stay f32, output f32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        conv = lambda f: nn.Conv(  # noqa: E731
            f, (3, 3), padding="SAME", use_bias=False, kernel_init=nn.initializers.xavier_normal(),
            dtype=self.dtype,
        )
        out = conv(self.channels)(x)
        h = out
        for _ in range(self.nb_res_blocks):
            h = self.regularization_factor * conv(self.channels)(nn.relu(conv(self.channels)(h))) + h
        h = conv(self.channels)(h) + out
        return conv(2)(h).astype(in_dtype)


def conjugate_gradient(
    rhs: jnp.ndarray,
    sens: jnp.ndarray,
    mask: jnp.ndarray,
    mu,
    iterations: int = 10,
    fft_centered: bool = False,
    fft_normalization: str = "ortho",
    spatial_dims: Sequence[int] = (-2, -1),
    coil_dim: int = 1,
) -> jnp.ndarray:
    """Solve (E^H E + mu I) x = rhs by CG (reference ConjugateGradient :57-200)."""
    if mask.ndim == sens.ndim - 1:
        mask = mask[..., None]

    def ehe(x):
        k = fft2_rv(cmul(x[:, None], sens), fft_centered, fft_normalization, spatial_dims)
        img = ifft2_rv(k * mask, fft_centered, fft_normalization, spatial_dims)
        combined = cmul_conj(img, sens).sum(axis=coil_dim)
        return combined + mu * x

    def cdot(a, b):
        """<a, b> = sum conj(a)*b as a complex pair."""
        prod = cmul(jnp.stack([a[..., 0], -a[..., 1]], -1), b)
        return jnp.stack([prod[..., 0].sum(), prod[..., 1].sum()])

    def cdiv(num, den):
        d = den[0] ** 2 + den[1] ** 2 + 1e-30
        return jnp.stack([(num[0] * den[0] + num[1] * den[1]) / d, (num[1] * den[0] - num[0] * den[1]) / d])

    def cscale(s, x):
        return jnp.stack([s[0] * x[..., 0] - s[1] * x[..., 1], s[0] * x[..., 1] + s[1] * x[..., 0]], -1)

    x0 = jnp.zeros_like(rhs)
    rs0 = cdot(rhs, rhs)

    def body(_, carry):
        rsold, x, r, p = carry
        ap = ehe(p)
        alpha = cdiv(rsold, cdot(p, ap))
        x = x + cscale(alpha, p)
        r = r - cscale(alpha, ap)
        rsnew = cdot(r, r)
        beta = cdiv(rsnew, rsold)
        p = r + cscale(beta, p)
        return rsnew, x, r, p

    _, x, _, _ = jax.lax.fori_loop(0, iterations, body, (rs0, x0, rhs, rhs))
    return x


class ResNet(BaseReconModel):
    unrolled_iterations: int = 10
    residual_blocks: int = 15
    channels: int = 64
    regularization_factor: float = 0.1
    conjugate_gradient_dc: bool = False
    conjugate_gradient_iterations: int = 10
    penalization_weight: float = 1.0
    compute_dtype: str = None  # opt-in bf16 for the residual conv net; the
    # CG data-consistency solve stays f32

    @classmethod
    def from_config(cls, cfg):
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            unrolled_iterations=cfg.get("unrolled_iterations", 10),
            residual_blocks=cfg.get("residual_blocks", 15),
            channels=cfg.get("channels", 64),
            regularization_factor=cfg.get("regularization_factor", 0.1),
            conjugate_gradient_dc=cfg.get("conjugate_gradient_dc", False),
            conjugate_gradient_iterations=cfg.get("conjugate_gradient_iterations", 10),
            penalization_weight=cfg.get("penalization_weight", 1.0),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        prediction = self.zero_filled(y, sens)
        net = ResidualNetwork(
            self.residual_blocks, self.channels, self.regularization_factor, dtype=self.compute_dtype
        )
        mu = (
            self.param("mu", nn.initializers.constant(self.penalization_weight), (1,))
            if self.conjugate_gradient_dc
            else None
        )
        x = prediction
        for _ in range(self.unrolled_iterations):
            x = net(x)
            if self.conjugate_gradient_dc:
                x = conjugate_gradient(
                    prediction + mu * x,
                    sens,
                    mask,
                    mu,
                    self.conjugate_gradient_iterations,
                    self.fft_centered,
                    self.fft_normalization,
                    self.spatial_dims,
                    self.coil_dim,
                )
        return ModelOutput(prediction=x)


class ProximalGradient(BaseReconModel):
    """Pure conjugate-gradient DC on the zero-filled recon (reference
    nn/proximal_gradient.py:19)."""

    conjugate_gradient_iterations: int = 10
    penalization_weight: float = 1.0

    @classmethod
    def from_config(cls, cfg):
        return cls(
            conjugate_gradient_iterations=cfg.get("conjugate_gradient_iterations", 10),
            penalization_weight=cfg.get("penalization_weight", 1.0),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False) -> ModelOutput:
        del init_pred, train
        mask = expand_mask(mask)
        mu = self.param("mu", nn.initializers.constant(self.penalization_weight), (1,))
        prediction = self.zero_filled(y, sens)
        x = conjugate_gradient(
            prediction,
            sens,
            mask,
            mu,
            self.conjugate_gradient_iterations,
            self.fft_centered,
            self.fft_normalization,
            self.spatial_dims,
            self.coil_dim,
        )
        return ModelOutput(prediction=x)
