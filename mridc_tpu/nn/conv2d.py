"""Simple conv cascade used by CascadeNet/CRNN regularizers.

Functional parity with reference:
mridc/collections/reconstruction/nn/conv/conv2d.py (3x3 convs, PReLU between,
optional batchnorm).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mridc_tpu.nn.fold import fold_w, unfold_w
from mridc_tpu.nn.layers import Conv

__all__ = ["Conv2dCascade"]


class Conv2dCascade(nn.Module):
    out_channels: int = 2
    hidden_channels: int = 64
    n_convs: int = 3
    batchnorm: bool = False
    live_bn: bool = False  # track running BatchNorm stats (train_batch_stats)
    lane_fold: str = "auto"  # fold the 64-channel convs to full MXU lane
    # width on non-CPU backends (exact rewrite, nn/fold.py; params are laid
    # out identically either way). Disabled with batchnorm: folded per-channel
    # stats would split over column parities.
    dtype: str = None  # opt-in bf16 conv compute; params and BatchNorm stats
    # stay f32, output is cast back to f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fold = self.lane_fold == "always" or (
            self.lane_fold == "auto"
            and jax.default_backend() != "cpu"
            and not self.batchnorm
            and x.shape[-2] % 2 == 0
        )
        if fold:
            x = fold_w(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for idx in range(self.n_convs):
            feats = self.hidden_channels if idx != self.n_convs - 1 else self.out_channels
            x = Conv(feats, (3, 3), padding="SAME", lane_fold=fold, fold_pad_mode="zero", dtype=self.dtype)(x)
            if self.batchnorm:
                # torch semantics (reference conv/conv2d.py:53: eps=1e-4,
                # default momentum 0.1); frozen params by default, live
                # batch_stats under train_batch_stats
                from mridc_tpu.nn.layers import TorchBatchNorm

                x = TorchBatchNorm(eps=1e-4, live=self.live_bn)(x.astype(jnp.float32), train).astype(x.dtype)
            if idx != self.n_convs - 1:
                alpha = self.param(f"prelu_{idx}", nn.initializers.constant(0.25), (1,))
                x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        if fold:
            x = unfold_w(x)
        return x if self.dtype is None else x.astype(jnp.float32)
