"""Simple conv cascade used by CascadeNet/CRNN regularizers.

Functional parity with reference:
mridc/collections/reconstruction/nn/conv/conv2d.py (3x3 convs, PReLU between,
optional batchnorm).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Conv2dCascade"]


class Conv2dCascade(nn.Module):
    out_channels: int = 2
    hidden_channels: int = 64
    n_convs: int = 3
    batchnorm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for idx in range(self.n_convs):
            feats = self.hidden_channels if idx != self.n_convs - 1 else self.out_channels
            x = nn.Conv(feats, (3, 3), padding="SAME")(x)
            if self.batchnorm:
                x = nn.BatchNorm(use_running_average=not train, epsilon=1e-4)(x)
            if idx != self.n_convs - 1:
                alpha = self.param(f"prelu_{idx}", nn.initializers.constant(0.25), (1,))
                x = jnp.where(x >= 0, x, alpha * x)
        return x
