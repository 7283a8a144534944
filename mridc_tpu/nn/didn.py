"""DIDN: Deep Iterative Down-up CNN (k-space regularizer for KIKINet/XPDNet).

Functional parity with reference:
mridc/collections/reconstruction/nn/didn/didn.py (``Subpixel`` :11, ``DUB``
:104, ``ReconBlock``, ``DIDN`` :242): strided-conv downsamples, pixel-shuffle
upsamples, per-DUB reconstruction blocks aggregated by 1x1 conv.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Subpixel", "DUB", "ReconBlock", "DIDN"]


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


class _PConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: str = None

    @nn.compact
    def __call__(self, x, act: bool = True):
        # explicit symmetric k//2 padding (torch Conv2d padding=k//2 semantics;
        # flax "SAME" pads right-heavy for stride>1 on even sizes, which shifts
        # strided convs by one pixel vs the reference)
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dtype=self.dtype,
        )(x)
        if act:
            alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
            x = _prelu(x, alpha.astype(x.dtype))
        return x


class Subpixel(nn.Module):
    """Conv + pixel shuffle (NHWC depth-to-space)."""

    features: int
    upscale: int = 2
    kernel: int = 1
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features * self.upscale**2, (self.kernel, self.kernel), padding="SAME", dtype=self.dtype)(x)
        b, h, w, c = x.shape
        r = self.upscale
        # torch PixelShuffle channel order: ch = c_out * r^2 + i * r + j
        # (didn.py:11 uses nn.PixelShuffle) — keep the same layout so torch
        # checkpoints import unchanged
        x = x.reshape(b, h, w, c // (r * r), r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(b, h * r, w * r, c // (r * r))


class ReconBlock(nn.Module):
    num_convs: int = 9
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        out = x
        for i in range(self.num_convs):
            out = _PConv(x.shape[-1], dtype=self.dtype)(out, act=i < self.num_convs - 1)
        return x + out


class DUB(nn.Module):
    """Down-Up Block (reference :104-241)."""

    channels: int
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        c = self.channels
        # pad odd spatial sizes
        ph = x.shape[1] % 2
        pw = x.shape[2] % 2
        x1 = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect") if (ph or pw) else x

        def seq(inp, feats, n):
            out = inp
            for _ in range(n):
                out = _PConv(feats, dtype=self.dtype)(out)
            return out

        x1 = x1 + seq(x1, c, 2)
        x2 = _PConv(2 * c, stride=2, dtype=self.dtype)(x1, act=False)
        x2 = x2 + seq(x2, 2 * c, 1)
        out = _PConv(4 * c, stride=2, dtype=self.dtype)(x2, act=False)
        out = out + seq(out, 4 * c, 1)
        out = Subpixel(2 * c, 2, 1, dtype=self.dtype)(out)
        out = out[:, : x2.shape[1], : x2.shape[2]]
        out = nn.Conv(2 * c, (1, 1), dtype=self.dtype)(jnp.concatenate([x2, out], -1))
        out = out + seq(out, 2 * c, 1)
        out = Subpixel(c, 2, 1, dtype=self.dtype)(out)
        out = out[:, : x1.shape[1], : x1.shape[2]]
        out = nn.Conv(c, (1, 1), dtype=self.dtype)(jnp.concatenate([x1, out], -1))
        out = out + seq(out, c, 2)
        out = seq(out, c, 1)
        return x + out[:, : x.shape[1], : x.shape[2]]


class DIDN(nn.Module):
    out_channels: int = 2
    hidden_channels: int = 128
    num_dubs: int = 6
    num_convs_recon: int = 9
    skip_connection: bool = False
    dtype: str = None  # opt-in bf16 conv compute; params (incl. PReLU alphas)
    # stay f32, output is cast back to f32

    @nn.compact
    def __call__(self, x):
        h_in, w_in = x.shape[1], x.shape[2]
        x_in = x
        if self.dtype is not None:
            x = x.astype(self.dtype)
        out = _PConv(self.hidden_channels, dtype=self.dtype)(x)
        out = _PConv(self.hidden_channels, stride=2, dtype=self.dtype)(out, act=False)
        dub_outs = []
        for _ in range(self.num_dubs):
            out = DUB(self.hidden_channels, dtype=self.dtype)(out)
            dub_outs.append(out)
        # ONE recon block shared across all DUB outputs (reference didn.py:341
        # applies self.recon_block to every dub_out; weights are shared)
        recon_block = ReconBlock(self.num_convs_recon, dtype=self.dtype)
        recon = [recon_block(d) for d in dub_outs]
        out = nn.Conv(self.hidden_channels, (1, 1), dtype=self.dtype)(jnp.concatenate(recon, -1))
        out = _PConv(self.hidden_channels, dtype=self.dtype)(out)
        out = Subpixel(self.hidden_channels, 2, 1, dtype=self.dtype)(out)
        out = _PConv(self.out_channels, dtype=self.dtype)(out, act=False)
        out = out[:, :h_in, :w_in].astype(x_in.dtype)
        if self.skip_connection:
            out = x_in[..., : self.out_channels] + out
        return out
