"""Segmentation building blocks: attention gates, lambda layers, VNet /
DynUNet / UNETR(ViT) components (Flax, NHWC / NDHWC).

Functional parity with reference:
mridc/collections/segmentation/nn/attention_unet_base/attention_unet_block.py:10
(``AttentionGate``), lambda_unet_base/lambda_unet_block.py:11 (``LambdaLayer``),
vnet_base/vnet_block.py:260 (``VNet``), dynunet_base/dynunet_block.py:90
(MONAI-style DynUNet), vit_base (``PatchEmbeddingBlock`` :20, ``SABlock`` :82,
transformer blocks) and unetr_base/unetr_block.py:635.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mridc_tpu.nn.layers import InstanceNorm

__all__ = [
    "AttentionGate",
    "AttentionUnet",
    "LambdaLayer",
    "LambdaUnet",
    "VNet",
    "DynUNet",
    "ViT",
    "UNETR",
    "UNet3D",
]


# --------------------------------------------------------------------------
# Attention UNet
# --------------------------------------------------------------------------


class AttentionGate(nn.Module):
    """Additive attention gate (Oktay et al.), reference
    attention_unet_block.py:10: W_x is a strided 2x2 conv (no bias), W_g a 1x1
    conv bilinearly resized onto W_x's grid; the sigmoid(psi(relu(...))) map is
    resized back to x's grid and gates x. Output channels == x's channels."""

    out_chans: int

    @nn.compact
    def __call__(self, x, g):
        from mridc_tpu.nn.layers import bilinear_resize

        wx = nn.Conv(self.out_chans, (2, 2), strides=(2, 2), padding="VALID", use_bias=False)(x)
        wg = nn.Conv(self.out_chans, (1, 1))(g)
        wg = bilinear_resize(wg, wx.shape[1], wx.shape[2])
        f = nn.relu(wx + wg)
        a = nn.sigmoid(nn.Conv(1, (1, 1))(f))
        a = bilinear_resize(a, x.shape[1], x.shape[2])
        return a * x


class AttentionUnet(nn.Module):
    """fastMRI-style U-Net with attention-gated skips (reference
    attention_unet_block.py:67: ConvBlock/TransposeConvBlock trunks, avg-pool
    downsampling, gates applied to the skip with the pre-upsample decoder
    feature as gating signal, concat order [decoder, gated skip])."""

    out_chans: int
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mridc_tpu.nn.unet import ConvBlock, TransposeConvBlock

        ch = self.chans
        skips = []
        for i in range(self.num_pool_layers):
            x = ConvBlock(ch, self.drop_prob)(x, train)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            if i < self.num_pool_layers - 1:
                ch *= 2
        x = ConvBlock(ch * 2, self.drop_prob)(x, train)
        for i in range(self.num_pool_layers):
            skip = skips.pop()
            gated = AttentionGate(ch)(skip, x)
            x = TransposeConvBlock(ch)(x)
            pad_h = gated.shape[1] - x.shape[1]
            pad_w = gated.shape[2] - x.shape[2]
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            x = jnp.concatenate([x, gated], axis=-1)
            x = ConvBlock(ch, self.drop_prob)(x, train)
            if i < self.num_pool_layers - 1:
                ch //= 2
            else:
                x = nn.Conv(self.out_chans, (1, 1))(x)
        return x


# --------------------------------------------------------------------------
# Lambda UNet
# --------------------------------------------------------------------------


class LambdaLayer(nn.Module):
    """Lambda attention layer (reference lambda_unet_block.py:11): content
    lambda via softmax keys over positions, position lambda via a Conv3d over
    the [intra_depth, v, H, W] value map, optional temporal lambda across
    slices for temporal_kernel >= 3. q and v projections carry BatchNorm
    (torch semantics via TorchBatchNorm)."""

    out_channels: int
    query_depth: int = 16
    intra_depth: int = 1
    receptive_kernel: int = 3
    temporal_kernel: int = 1
    heads: int = 4
    num_slices: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mridc_tpu.nn.layers import TorchBatchNorm

        if self.out_channels % self.heads:
            raise ValueError("out_channels must be divisible by the number of heads")
        b, hh, ww, _ = x.shape
        kd, u, h = self.query_depth, self.intra_depth, self.heads
        vd = self.out_channels // h
        n = hh * ww

        q = nn.Conv(kd * h, (1, 1), use_bias=False)(x)
        q = TorchBatchNorm()(q, train)
        k = nn.Conv(kd * u, (1, 1), use_bias=False)(x)
        v = nn.Conv(vd * u, (1, 1), use_bias=False)(x)
        v = TorchBatchNorm()(v, train)

        # NHWC channel c maps to torch (group, inner) = (c // inner, c % inner)?
        # torch rearrange "b (h k) hh ww" splits channel-major: group index h
        # first. Our conv output channel order matches torch's (imported
        # kernels keep output-channel order), so reshape [..., h, k].
        q = q.reshape(b, n, h, kd)          # [b, n, h, k]
        k = k.reshape(b, n, u, kd)          # [b, n, u, k]
        v = v.reshape(b, n, u, vd)          # [b, n, u, v]

        k = jax.nn.softmax(k, axis=1)       # softmax over positions m
        lam_c = jnp.einsum("bmuk,bmuv->bkv", k, v)
        y_c = jnp.einsum("bnhk,bkv->bnhv", q, lam_c)

        # position lambda: Conv3d(u -> k, (1, rk, rk)) over [b, u, v, hh, ww];
        # NDHWC layout: [b, v(depth), hh, ww, u] -> [b, v, hh, ww, k]
        v_p = v.reshape(b, hh, ww, u, vd).transpose(0, 4, 1, 2, 3)
        lam_p = nn.Conv(
            kd, (1, self.receptive_kernel, self.receptive_kernel), padding="SAME"
        )(v_p)                               # [b, v, hh, ww, k]
        lam_p = lam_p.reshape(b, vd, n, kd)
        y_p = jnp.einsum("bnhk,bvnk->bnhv", q, lam_p)

        y = y_c + y_p
        if self.temporal_kernel >= 3:
            if self.temporal_kernel > self.num_slices or self.temporal_kernel % 2 != 1:
                raise ValueError("temporal_kernel must be odd and <= num_slices")
            t = self.num_slices
            g = b // t
            # reference: v [(g t), u, v, p] -> [(g p), u, v, t], Conv2d(u->k,
            # (1, tk)); NHWC: [(g p), v, t, u] -> [(g p), v, t, k]
            v_t = v.reshape(g, t, n, u, vd).transpose(0, 2, 4, 1, 3).reshape(g * n, vd, t, u)
            lam_t = nn.Conv(kd, (1, self.temporal_kernel), padding="SAME")(v_t)
            lam_t = lam_t.reshape(g, n, vd, t, kd).transpose(0, 3, 4, 2, 1).reshape(b, kd, vd, n)
            y_t = jnp.einsum("bnhk,bkvn->bnhv", q, lam_t)
            y = y + y_t

        return y.reshape(b, hh, ww, h * vd)


class LambdaBlock(nn.Module):
    """Two LambdaLayers each followed by InstanceNorm + LeakyReLU(0.2) +
    Dropout (reference lambda_unet_block.py:134)."""

    out_chans: int
    drop_prob: float = 0.0
    query_depth: int = 16
    intra_depth: int = 4
    receptive_kernel: int = 3
    temporal_kernel: int = 1
    num_slices: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        heads = max(1, self.out_chans // 32)
        for _ in range(2):
            x = LambdaLayer(
                out_channels=self.out_chans,
                query_depth=self.query_depth,
                intra_depth=self.intra_depth,
                receptive_kernel=self.receptive_kernel,
                temporal_kernel=self.temporal_kernel,
                heads=heads,
                num_slices=self.num_slices,
            )(x, train)
            x = InstanceNorm()(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x


class LambdaUnet(nn.Module):
    """fastMRI U-Net skeleton with LambdaBlocks in place of ConvBlocks
    (reference lambda_unet_block.py:214 ``LambdaUNet``: avg-pool downs,
    TransposeConvBlock ups, final Sequential(LambdaBlock, 1x1 conv))."""

    out_chans: int
    chans: int = 32
    num_pool_layers: int = 4
    drop_prob: float = 0.0
    query_depth: int = 16
    intra_depth: int = 4
    receptive_kernel: int = 3
    temporal_kernel: int = 1
    num_slices: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mridc_tpu.nn.unet import TransposeConvBlock

        kw = dict(
            drop_prob=self.drop_prob,
            query_depth=self.query_depth,
            intra_depth=self.intra_depth,
            receptive_kernel=self.receptive_kernel,
            temporal_kernel=self.temporal_kernel,
            num_slices=self.num_slices,
        )
        ch = self.chans
        skips = []
        for i in range(self.num_pool_layers):
            x = LambdaBlock(out_chans=ch, **kw)(x, train)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            if i < self.num_pool_layers - 1:
                ch *= 2
        x = LambdaBlock(out_chans=ch * 2, **kw)(x, train)
        for i in range(self.num_pool_layers):
            skip = skips.pop()
            x = TransposeConvBlock(ch)(x)
            pad_h = skip.shape[1] - x.shape[1]
            pad_w = skip.shape[2] - x.shape[2]
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            x = jnp.concatenate([x, skip], axis=-1)
            x = LambdaBlock(out_chans=ch, **kw)(x, train)
            if i < self.num_pool_layers - 1:
                ch //= 2
            else:
                x = nn.Conv(self.out_chans, (1, 1))(x)
        return x


# --------------------------------------------------------------------------
# VNet
# --------------------------------------------------------------------------


class _VNetStage(nn.Module):
    features: int
    n_convs: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = x
        for j in range(self.n_convs):
            out = nn.Conv(self.features, (5, 5), padding="SAME")(out)
            out = nn.BatchNorm(use_running_average=not train)(out)
            alpha = self.param(f"prelu_{j}", nn.initializers.constant(0.25), (1,))
            out = jnp.where(out >= 0, out, alpha * out)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        return out + x


class VNet(nn.Module):
    out_chans: int
    chans: int = 16
    num_stages: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.chans
        skips = []
        convs_per_stage = [1, 2, 3, 3, 3]
        for i in range(self.num_stages):
            x = _VNetStage(ch, convs_per_stage[min(i, 4)])(x, train)
            skips.append(x)
            x = nn.Conv(ch * 2, (2, 2), strides=(2, 2))(x)  # down conv
            x = nn.relu(x)
            ch *= 2
        x = _VNetStage(ch, 3)(x, train)
        for i in range(self.num_stages):
            skip = skips.pop()
            ch //= 2
            x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2))(x)
            pad_h = skip.shape[1] - x.shape[1]
            pad_w = skip.shape[2] - x.shape[2]
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            x = _VNetStage(ch, convs_per_stage[min(self.num_stages - 1 - i, 4)])(
                jnp.concatenate([x, skip], -1), train
            )
        return nn.Conv(self.out_chans, (1, 1))(x)


# --------------------------------------------------------------------------
# DynUNet (MONAI-style)
# --------------------------------------------------------------------------


class _DynBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        # explicit (1,1) padding: torch Conv2d padding=1 semantics for the
        # strided down conv (flax SAME pads right-heavy for stride>1)
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(x)
        x = InstanceNorm()(x)
        return nn.leaky_relu(x, 0.01)


class DynUNet(nn.Module):
    out_chans: int
    chans: int = 32
    num_pool_layers: int = 4
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        ch = self.chans
        skips = []
        x = _DynBlock(ch)(x)
        for i in range(self.num_pool_layers):
            skips.append(x)
            ch = min(ch * 2, 320)
            x = _DynBlock(ch, stride=2)(x)
        heads = []
        for i in range(self.num_pool_layers):
            skip = skips.pop()
            x = nn.ConvTranspose(skip.shape[-1], (2, 2), strides=(2, 2), use_bias=False)(x)
            pad_h = skip.shape[1] - x.shape[1]
            pad_w = skip.shape[2] - x.shape[2]
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            x = _DynBlock(skip.shape[-1])(jnp.concatenate([x, skip], -1))
            if self.deep_supervision and i >= self.num_pool_layers - 3:
                heads.append(nn.Conv(self.out_chans, (1, 1))(x))
        out = nn.Conv(self.out_chans, (1, 1))(x)
        if self.deep_supervision:
            return out, heads[:-1]
        return out


# --------------------------------------------------------------------------
# ViT / UNETR
# --------------------------------------------------------------------------


class _MHSA(nn.Module):
    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        return nn.MultiHeadDotProductAttention(num_heads=self.num_heads, qkv_features=self.hidden_size)(x, x)


class _TransformerBlock(nn.Module):
    hidden_size: int
    mlp_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        x = x + _MHSA(self.hidden_size, self.num_heads)(y)
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.mlp_dim)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.hidden_size)(y)
        return x + y


class ViT(nn.Module):
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, C] -> (final tokens, hidden states list) tokens [B, N, D]."""
        b, h, w, c = x.shape
        p = self.patch_size
        patches = x.reshape(b, h // p, p, w // p, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (h // p) * (w // p), p * p * c
        )
        tokens = nn.Dense(self.hidden_size)(patches)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02), (1, tokens.shape[1], self.hidden_size))
        tokens = tokens + pos
        hidden = []
        for _ in range(self.num_layers):
            tokens = _TransformerBlock(self.hidden_size, self.mlp_dim, self.num_heads)(tokens)
            hidden.append(tokens)
        return nn.LayerNorm()(tokens), hidden


class UNETR(nn.Module):
    """UNETR: ViT encoder + conv decoder over intermediate hidden states
    (reference unetr_base/unetr_block.py:635)."""

    out_chans: int
    img_size: Tuple[int, int] = (64, 64)
    patch_size: int = 16
    hidden_size: int = 64
    mlp_dim: int = 256
    num_layers: int = 8
    num_heads: int = 4
    feature_size: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        b, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        _, hidden = ViT(self.hidden_size, self.mlp_dim, self.num_layers, self.num_heads, p)(x)

        def grid(tokens):
            return tokens.reshape(b, gh, gw, self.hidden_size)

        # pick evenly spaced hidden states
        idxs = [self.num_layers // 4 - 1, self.num_layers // 2 - 1, 3 * self.num_layers // 4 - 1, -1]
        z3, z6, z9, z12 = (grid(hidden[i]) for i in idxs)

        def deconv_stack(z, ups, feats):
            for _ in range(ups):
                z = nn.ConvTranspose(feats, (2, 2), strides=(2, 2))(z)
                z = nn.relu(nn.Conv(feats, (3, 3), padding="SAME")(z))
            return z

        enc1 = nn.relu(nn.Conv(self.feature_size, (3, 3), padding="SAME")(x))
        enc2 = deconv_stack(z3, 3, self.feature_size * 2)  # p/8 up => 2x at p=16? scale generically
        enc3 = deconv_stack(z6, 2, self.feature_size * 4)
        enc4 = deconv_stack(z9, 1, self.feature_size * 8)
        dec = z12

        def up_cat(a, skip, feats):
            a = nn.ConvTranspose(feats, (2, 2), strides=(2, 2))(a)
            sh, sw = skip.shape[1], skip.shape[2]
            a = a[:, :sh, :sw]
            if a.shape[1] < sh or a.shape[2] < sw:
                a = jnp.pad(a, ((0, 0), (0, sh - a.shape[1]), (0, sw - a.shape[2]), (0, 0)))
            a = jnp.concatenate([a, skip], -1)
            return nn.relu(nn.Conv(feats, (3, 3), padding="SAME")(a))

        d = up_cat(dec, enc4, self.feature_size * 8)
        d = up_cat(d, enc3, self.feature_size * 4)
        d = up_cat(d, enc2, self.feature_size * 2)
        # final upsample chain back to full resolution
        while d.shape[1] < h:
            d = nn.ConvTranspose(self.feature_size, (2, 2), strides=(2, 2))(d)
            d = nn.relu(nn.Conv(self.feature_size, (3, 3), padding="SAME")(d))
        d = jnp.concatenate([d[:, :h, :w], enc1], -1)
        d = nn.relu(nn.Conv(self.feature_size, (3, 3), padding="SAME")(d))
        return nn.Conv(self.out_chans, (1, 1))(d)


# --------------------------------------------------------------------------
# 3D UNet
# --------------------------------------------------------------------------


class _ConvBlock3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        return x


class UNet3D(nn.Module):
    """3D UNet over [B, D, H, W, C] volumes (reference unet3d_block.py:72)."""

    out_chans: int
    chans: int = 16
    num_pool_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.chans
        skips = []
        for i in range(self.num_pool_layers):
            x = _ConvBlock3D(ch)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
            if i < self.num_pool_layers - 1:
                ch *= 2
        x = _ConvBlock3D(ch * 2)(x, train)
        for i in range(self.num_pool_layers):
            skip = skips.pop()
            x = nn.ConvTranspose(ch, (1, 2, 2), strides=(1, 2, 2))(x)
            pads = [(0, skip.shape[d] - x.shape[d]) for d in (1, 2, 3)]
            if any(p[1] for p in pads):
                x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
            x = _ConvBlock3D(ch)(jnp.concatenate([x, skip], -1), train)
            if i < self.num_pool_layers - 1:
                ch //= 2
        return nn.Conv(self.out_chans, (1, 1, 1))(x)

