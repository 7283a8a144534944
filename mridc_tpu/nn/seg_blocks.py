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
import numpy as np

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


def _bn_f32(x, train, live: bool = False):
    """TorchBatchNorm computed in f32 regardless of the compute dtype
    (running stats are params — or batch_stats when live; bf16 batch stats
    would drift them)."""
    from mridc_tpu.nn.layers import TorchBatchNorm

    return TorchBatchNorm(live=live)(x.astype(jnp.float32), train).astype(x.dtype)


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
    dtype: str = None  # opt-in bf16 conv compute for the trunks (params and
    # the attention gates stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mridc_tpu.nn.unet import ConvBlock, TransposeConvBlock

        ch = self.chans
        skips = []
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i in range(self.num_pool_layers):
            x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            if i < self.num_pool_layers - 1:
                ch *= 2
        x = ConvBlock(ch * 2, self.drop_prob, dtype=self.dtype)(x, train)
        for i in range(self.num_pool_layers):
            skip = skips.pop()
            # the gate mixes sigmoid attention over small tensors — keep f32
            gated = AttentionGate(ch)(skip.astype(jnp.float32), x.astype(jnp.float32))
            if self.dtype is not None:
                gated = gated.astype(self.dtype)
            x = TransposeConvBlock(ch, dtype=self.dtype)(x)
            pad_h = gated.shape[1] - x.shape[1]
            pad_w = gated.shape[2] - x.shape[2]
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            x = jnp.concatenate([x, gated], axis=-1)
            x = ConvBlock(ch, self.drop_prob, dtype=self.dtype)(x, train)
            if i < self.num_pool_layers - 1:
                ch //= 2
            else:
                x = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype)(x)
        return x if self.dtype is None else x.astype(jnp.float32)


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
    live_bn: bool = False  # track running BatchNorm stats (train_batch_stats)
    dtype: str = None  # opt-in bf16 compute (BatchNorms and the key softmax
    # run f32; params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.out_channels % self.heads:
            raise ValueError("out_channels must be divisible by the number of heads")
        b, hh, ww, _ = x.shape
        kd, u, h = self.query_depth, self.intra_depth, self.heads
        vd = self.out_channels // h
        n = hh * ww

        q = nn.Conv(kd * h, (1, 1), use_bias=False, dtype=self.dtype)(x)
        q = _bn_f32(q, train, self.live_bn)
        k = nn.Conv(kd * u, (1, 1), use_bias=False, dtype=self.dtype)(x)
        v = nn.Conv(vd * u, (1, 1), use_bias=False, dtype=self.dtype)(x)
        v = _bn_f32(v, train, self.live_bn)

        # NHWC channel c maps to torch (group, inner) = (c // inner, c % inner)?
        # torch rearrange "b (h k) hh ww" splits channel-major: group index h
        # first. Our conv output channel order matches torch's (imported
        # kernels keep output-channel order), so reshape [..., h, k].
        q = q.reshape(b, n, h, kd)          # [b, n, h, k]
        k = k.reshape(b, n, u, kd)          # [b, n, u, k]
        v = v.reshape(b, n, u, vd)          # [b, n, u, v]

        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(k.dtype)  # softmax over positions m (f32)
        lam_c = jnp.einsum("bmuk,bmuv->bkv", k, v)
        y_c = jnp.einsum("bnhk,bkv->bnhv", q, lam_c)

        # position lambda: Conv3d(u -> k, (1, rk, rk)) over [b, u, v, hh, ww];
        # NDHWC layout: [b, v(depth), hh, ww, u] -> [b, v, hh, ww, k]
        v_p = v.reshape(b, hh, ww, u, vd).transpose(0, 4, 1, 2, 3)
        lam_p = nn.Conv(
            kd, (1, self.receptive_kernel, self.receptive_kernel), padding="SAME", dtype=self.dtype
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
            lam_t = nn.Conv(kd, (1, self.temporal_kernel), padding="SAME", dtype=self.dtype)(v_t)
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
    live_bn: bool = False
    dtype: str = None

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
                live_bn=self.live_bn,
                dtype=self.dtype,
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
    live_bn: bool = False
    dtype: str = None  # opt-in bf16 compute; output cast back to f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mridc_tpu.nn.unet import TransposeConvBlock

        if self.dtype is not None:
            x = x.astype(self.dtype)
        kw = dict(
            drop_prob=self.drop_prob,
            query_depth=self.query_depth,
            intra_depth=self.intra_depth,
            receptive_kernel=self.receptive_kernel,
            temporal_kernel=self.temporal_kernel,
            num_slices=self.num_slices,
            live_bn=self.live_bn,
            dtype=self.dtype,
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
            x = TransposeConvBlock(ch, dtype=self.dtype)(x)
            pad_h = skip.shape[1] - x.shape[1]
            pad_w = skip.shape[2] - x.shape[2]
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            x = jnp.concatenate([x, skip], axis=-1)
            x = LambdaBlock(out_chans=ch, **kw)(x, train)
            if i < self.num_pool_layers - 1:
                ch //= 2
            else:
                x = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype)(x)
        return x if self.dtype is None else x.astype(jnp.float32)


# --------------------------------------------------------------------------
# VNet
# --------------------------------------------------------------------------


class _PReLU(nn.Module):
    """torch nn.PReLU: single learned negative slope shared over channels."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def _vnet_act(name: str):
    name = str(name).lower()
    if name == "elu":
        return lambda mdl, x: nn.elu(x)
    if name == "relu":
        return lambda mdl, x: nn.relu(x)
    if name == "leakyrelu":
        return lambda mdl, x: nn.leaky_relu(x, 0.01)
    if name == "prelu":
        return lambda mdl, x: _PReLU()(x)
    raise ValueError(f"Activation {name!r} not supported (relu/prelu/leakyrelu/elu)")


class _LUConv(nn.Module):
    """5x5 conv + BatchNorm + act (reference vnet_block.py:10)."""

    channels: int
    act: str = "elu"
    use_bias: bool = False
    live_bn: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (5, 5), padding="SAME", use_bias=self.use_bias, dtype=self.dtype)(x)
        x = _bn_f32(x, train, self.live_bn)
        return _vnet_act(self.act)(self, x)


class _VNetDown(nn.Module):
    """DownTransition (reference vnet_block.py:117): strided 2x2 conv doubling
    channels + BN + act, optional Dropout2d, n LUConvs, residual add."""

    in_channels: int
    convs: int
    act: str = "elu"
    dropout_prob: float = 0.0
    use_bias: bool = False
    live_bn: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_channels = 2 * self.in_channels
        down = nn.Conv(out_channels, (2, 2), strides=(2, 2), padding="VALID", use_bias=self.use_bias,
                       dtype=self.dtype)(x)
        down = _bn_f32(down, train, self.live_bn)
        down = _vnet_act(self.act)(self, down)
        out = down
        if self.dropout_prob > 0:
            out = nn.Dropout(self.dropout_prob, broadcast_dims=(1, 2), deterministic=not train)(out)
        for _ in range(self.convs):
            out = _LUConv(out_channels, self.act, self.use_bias, live_bn=self.live_bn, dtype=self.dtype)(out, train)
        return _vnet_act(self.act)(self, out + down)


class _VNetUp(nn.Module):
    """UpTransition (reference vnet_block.py:166): transpose conv to
    out_channels//2 + BN + act, concat with Dropout2d(0.5)'d skip, n LUConvs,
    residual add of the concatenated input."""

    out_channels: int
    convs: int
    act: str = "elu"
    dropout_prob: float = 0.0
    live_bn: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if self.dropout_prob > 0:
            x = nn.Dropout(self.dropout_prob, broadcast_dims=(1, 2), deterministic=not train)(x)
        skip = nn.Dropout(0.5, broadcast_dims=(1, 2), deterministic=not train)(skip)
        out = nn.ConvTranspose(self.out_channels // 2, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
        out = _bn_f32(out, train, self.live_bn)
        out = _vnet_act(self.act)(self, out)
        xcat = jnp.concatenate([out, skip.astype(out.dtype)], axis=-1)
        out = xcat
        for _ in range(self.convs):
            out = _LUConv(self.out_channels, self.act, live_bn=self.live_bn, dtype=self.dtype)(out, train)
        return _vnet_act(self.act)(self, out + xcat)


class VNet(nn.Module):
    """V-Net (reference vnet_block.py:260, medzoo topology): fixed 16->256
    channel schedule — InputTransition(16) with channel-tiled residual, four
    DownTransitions, four UpTransitions, OutputTransition."""

    out_chans: int = 1
    act: str = "elu"
    drop_prob: float = 0.5
    use_bias: bool = False
    live_bn: bool = False
    dtype: str = None  # opt-in bf16 conv compute (BatchNorms f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chans = x.shape[-1]
        if 16 % in_chans != 0:
            raise ValueError(f"16 should be divisible by in_chans, got {in_chans}")
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # InputTransition (reference vnet_block.py:70)
        out = nn.Conv(16, (5, 5), padding="SAME", use_bias=self.use_bias, dtype=self.dtype)(x)
        out = _bn_f32(out, train, self.live_bn)
        out16 = _vnet_act(self.act)(self, out + jnp.tile(x, (1, 1, 1, 16 // in_chans)))

        lb = self.live_bn
        out32 = _VNetDown(16, 1, self.act, use_bias=self.use_bias, live_bn=lb, dtype=self.dtype)(out16, train)
        out64 = _VNetDown(32, 2, self.act, use_bias=self.use_bias, live_bn=lb, dtype=self.dtype)(out32, train)
        out128 = _VNetDown(64, 3, self.act, dropout_prob=self.drop_prob, use_bias=self.use_bias,
                           live_bn=lb, dtype=self.dtype)(out64, train)
        out256 = _VNetDown(128, 2, self.act, dropout_prob=self.drop_prob, use_bias=self.use_bias,
                           live_bn=lb, dtype=self.dtype)(out128, train)
        y = _VNetUp(256, 2, self.act, dropout_prob=self.drop_prob, live_bn=lb, dtype=self.dtype)(out256, out128, train)
        y = _VNetUp(128, 2, self.act, dropout_prob=self.drop_prob, live_bn=lb, dtype=self.dtype)(y, out64, train)
        y = _VNetUp(64, 1, self.act, live_bn=lb, dtype=self.dtype)(y, out32, train)
        y = _VNetUp(32, 1, self.act, live_bn=lb, dtype=self.dtype)(y, out16, train)
        # OutputTransition (reference vnet_block.py:216)
        y = nn.Conv(self.out_chans, (5, 5), padding="SAME", use_bias=self.use_bias, dtype=self.dtype)(y)
        y = _bn_f32(y, train, self.live_bn)
        y = _vnet_act(self.act)(self, y)
        y = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype)(y)
        return y if self.dtype is None else y.astype(jnp.float32)


# --------------------------------------------------------------------------
# DynUNet (MONAI-style)
# --------------------------------------------------------------------------


def _monai_padding(kernel: int, stride: int) -> int:
    """MONAI get_padding: (k - s + 1) // 2, must be non-negative."""
    p = (kernel - stride + 1) / 2
    if p < 0:
        raise ValueError("padding must not be negative (kernel >= stride - 1)")
    return int(p)


def _torch_conv(x, features, kernel, stride, use_bias=False, dtype=None):
    """torch Conv2d with MONAI padding semantics (explicit symmetric pad)."""
    p = _monai_padding(kernel, stride)
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((p, p), (p, p)), use_bias=use_bias, dtype=dtype,
    )(x)


class _TorchConvTranspose(nn.Module):
    """torch ConvTranspose2d(kernel, stride, padding=MONAI, output_padding=
    2p + s - k): VALID flax transpose then crop so output size == in * s."""

    features: int
    kernel: int
    stride: int
    use_bias: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        p = _monai_padding(k, s)
        out = nn.ConvTranspose(
            self.features, (k, k), strides=(s, s), padding="VALID", use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        h, w = x.shape[1] * s, x.shape[2] * s
        return out[:, p : p + h, p : p + w, :]


class UnetBasicBlock(nn.Module):
    """MONAI UnetBasicBlock (reference unetr_block.py:548): two convs each
    followed by InstanceNorm + LeakyReLU(0.01); first conv may be strided."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = _torch_conv(x, self.out_channels, self.kernel_size, self.stride, dtype=self.dtype)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.01)
        x = _torch_conv(x, self.out_channels, self.kernel_size, 1, dtype=self.dtype)
        x = InstanceNorm()(x)
        return nn.leaky_relu(x, 0.01)


class UnetResBlock(nn.Module):
    """MONAI UnetResBlock (reference unetr_block.py:355): conv-IN-lrelu,
    conv-IN, 1x1-strided shortcut when shape changes, add, lrelu."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        residual = x
        out = _torch_conv(x, self.out_channels, self.kernel_size, self.stride, dtype=self.dtype)
        out = InstanceNorm()(out)
        out = nn.leaky_relu(out, 0.01)
        out = _torch_conv(out, self.out_channels, self.kernel_size, 1, dtype=self.dtype)
        out = InstanceNorm()(out)
        stride_np = np.atleast_1d(self.stride)
        downsample = (x.shape[-1] != self.out_channels) or not np.all(stride_np == 1)
        if downsample:
            residual = _torch_conv(residual, self.out_channels, 1, self.stride, dtype=self.dtype)
        residual = residual.astype(out.dtype)
        # the reference creates norm3 unconditionally (unetr_block.py:355 init)
        # so the residual is ALWAYS instance-normalized, shortcut conv or not
        residual = InstanceNorm()(residual)
        return nn.leaky_relu(out + residual, 0.01)


class UnetUpBlock(nn.Module):
    """MONAI UnetUpBlock (reference unetr_block.py:462): transpose conv
    (kernel == stride == upsample_kernel_size), concat [up, skip],
    UnetBasicBlock."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    trans_bias: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        out = _TorchConvTranspose(
            self.out_channels, self.upsample_kernel_size, self.upsample_kernel_size, self.trans_bias,
            dtype=self.dtype,
        )(x)
        out = jnp.concatenate([out, skip.astype(out.dtype)], axis=-1)
        return UnetBasicBlock(self.out_channels, self.kernel_size, 1, dtype=self.dtype)(out, train)


class UnetOutBlock(nn.Module):
    """MONAI UnetOutBlock: 1x1 conv with bias (reference unetr_block.py:16);
    always returns f32 logits."""

    out_channels: int
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=self.dtype)(x).astype(jnp.float32)


class DynUNet(nn.Module):
    """MONAI-style DynUNet (reference dynunet_base/dynunet_block.py:90):
    input block + strided downsamples + bottleneck + UnetUpBlocks, with the
    nnU-Net filter schedule min(2**(5+i), 512) unless ``filters`` is given.
    ``deep_supervision`` returns [B, 1+deep_supr_num, classes, H, W]-style
    stacked heads in train mode (here: a list of per-head logits alongside the
    main output so the jitted loss can weight them)."""

    out_chans: int
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    filters: Optional[Sequence[int]] = None
    res_block: bool = False
    deep_supervision: bool = False
    deep_supr_num: int = 1
    dtype: str = None  # opt-in bf16 conv compute (InstanceNorm stats f32,
    # f32 logits out)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.strides)
        if len(self.kernel_size) != n or n < 3:
            raise ValueError("kernel_size and strides must have equal length >= 3")
        if self.dtype is not None:
            x = x.astype(self.dtype)
        filters = list(self.filters) if self.filters is not None else [min(2 ** (5 + i), 512) for i in range(n)]
        block = UnetResBlock if self.res_block else UnetBasicBlock

        # downs: input block + intermediate downsamples
        down_outs = []
        out = block(filters[0], self.kernel_size[0], self.strides[0], dtype=self.dtype)(x, train)
        down_outs.append(out)
        for i in range(1, n - 1):
            out = block(filters[i], self.kernel_size[i], self.strides[i], dtype=self.dtype)(out, train)
            down_outs.append(out)
        out = block(filters[-1], self.kernel_size[-1], self.strides[-1], dtype=self.dtype)(out, train)  # bottleneck

        # ups: reversed pairing with down outputs (dynunet_block.py get_upsamples)
        heads = []
        for i in range(n - 1):
            j = n - 2 - i  # index into down_outs / filters
            out = UnetUpBlock(
                filters[j], self.kernel_size[j + 1], upsample_kernel_size=self.strides[j + 1],
                dtype=self.dtype,
            )(out, down_outs[j], train)
            # supervision heads attach to the deepest deep_supr_num up outputs
            # above the final one (MONAI heads indices 1..deep_supr_num)
            if self.deep_supervision and 0 < j <= self.deep_supr_num:
                heads.append(UnetOutBlock(self.out_chans, dtype=self.dtype)(out))
        logits = UnetOutBlock(self.out_chans, dtype=self.dtype)(out)
        if self.deep_supervision and train:
            from mridc_tpu.nn.layers import nearest_resize

            # MONAI interpolate() default is nearest (dynunet_block.py:319)
            heads = [nearest_resize(h, logits.shape[1], logits.shape[2]) for h in heads]
            return jnp.stack([logits] + heads[::-1], axis=1)
        return logits


# --------------------------------------------------------------------------
# ViT / UNETR
# --------------------------------------------------------------------------


class SABlock(nn.Module):
    """ViT self-attention (reference vit_base/transformer_block.py:82): one
    fused qkv linear, per-head scaled dot-product, output projection."""

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    dtype: str = None  # compute dtype for the projections/attention matmuls;
    # the softmax runs f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        h = self.num_heads
        d = self.hidden_size // h
        qkv = nn.Dense(self.hidden_size * 3, use_bias=self.qkv_bias, dtype=self.dtype)(x)
        # torch Rearrange "b h (qkv l d) -> qkv b l h d": channel split order
        # is (qkv, heads, dim)
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = jnp.einsum("blxd,blyd->blxy", q, k) * (d ** -0.5)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(att.dtype)
        att = nn.Dropout(self.dropout_rate, deterministic=not train)(att)
        out = jnp.einsum("bhxy,bhyd->bhxd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden_size)
        out = nn.Dense(self.hidden_size, dtype=self.dtype)(out)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(out)


class MLPBlock(nn.Module):
    """ViT MLP (reference vit_base/transformer_block.py:16): Dense-GELU-
    Dropout-Dense-Dropout."""

    hidden_size: int
    mlp_dim: int
    dropout_rate: float = 0.0
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.gelu(nn.Dense(self.mlp_dim, dtype=self.dtype)(x), approximate=False)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


def _token_instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """The reference TransformerBlock applies torch InstanceNorm2d to the
    [B, L, D] token tensor (transformer_block.py:190) — torch treats a 3D
    input as unbatched (C, H, W), so each batch element is normalized over
    all (token, feature) positions jointly, with no affine. Mirrored exactly
    (upstream deviation from MONAI's LayerNorm, pinned by golden test)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class TransformerBlock(nn.Module):
    """Pre-norm transformer block (reference vit_base/transformer_block.py:140)."""

    hidden_size: int
    mlp_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + SABlock(self.hidden_size, self.num_heads, self.dropout_rate, self.qkv_bias,
                        dtype=self.dtype)(_token_instance_norm(x), train)
        x = x + MLPBlock(self.hidden_size, self.mlp_dim, self.dropout_rate,
                         dtype=self.dtype)(_token_instance_norm(x), train)
        return x


class PatchEmbedding(nn.Module):
    """Patch embedding (reference vit_base/patchembedding.py:20): conv or
    perceptron patching + learned position embeddings + dropout."""

    patch_size: int
    hidden_size: int
    pos_embed: str = "conv"
    dropout_rate: float = 0.0
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        p = self.patch_size
        n = (hh // p) * (ww // p)
        if self.pos_embed == "conv":
            tok = nn.Conv(self.hidden_size, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype)(x)
            tok = tok.reshape(b, -1, self.hidden_size)
        elif self.pos_embed == "perceptron":
            # torch rearrange "b c (h p1) (w p2) -> b (h w) (p1 p2 c)"
            tok = x.transpose(0, 3, 1, 2).reshape(b, c, hh // p, p, ww // p, p)
            tok = tok.transpose(0, 2, 4, 3, 5, 1).reshape(b, n, p * p * c)
            tok = nn.Dense(self.hidden_size, dtype=self.dtype)(tok)
        else:
            raise ValueError(f"Unknown pos_embed {self.pos_embed!r}")
        pos = self.param(
            "position_embeddings",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            (1, n, self.hidden_size),
        )
        return nn.Dropout(self.dropout_rate, deterministic=not train)(tok + pos.astype(tok.dtype))


class _LayerNorm(nn.Module):
    """torch nn.LayerNorm over the last axis, with affine params."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias).astype(x.dtype)


class ViT(nn.Module):
    """Vision transformer trunk (reference vit_base/vit_block.py:17): patch
    embedding, num_layers TransformerBlocks (all hidden states returned),
    final LayerNorm."""

    patch_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    pos_embed: str = "conv"
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        tok = PatchEmbedding(self.patch_size, self.hidden_size, self.pos_embed, self.dropout_rate,
                             dtype=self.dtype)(x, train)
        hidden_states = []
        for _ in range(self.num_layers):
            tok = TransformerBlock(
                self.hidden_size, self.mlp_dim, self.num_heads, self.dropout_rate, self.qkv_bias,
                dtype=self.dtype,
            )(tok, train)
            hidden_states.append(tok)
        return _LayerNorm()(tok), hidden_states


class UnetrPrUpBlock(nn.Module):
    """UNETR projection-upsample path (reference unetr_block.py:135): an
    initial k2 s2 transpose conv, then ``num_layer`` [transpose conv +
    Basic/Res block] stages."""

    out_channels: int
    num_layer: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    conv_block: bool = True
    res_block: bool = True
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        up = self.upsample_kernel_size
        x = _TorchConvTranspose(self.out_channels, up, up, dtype=self.dtype)(x)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        for _ in range(self.num_layer):
            x = _TorchConvTranspose(self.out_channels, up, up, dtype=self.dtype)(x)
            if self.conv_block:
                x = block(self.out_channels, self.kernel_size, 1, dtype=self.dtype)(x, train)
        return x


class UnetrUpBlock(nn.Module):
    """UNETR decoder block (reference unetr_block.py:273): transpose conv,
    concat skip, Basic/Res block."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    res_block: bool = True
    dtype: str = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        up = self.upsample_kernel_size
        out = _TorchConvTranspose(self.out_channels, up, up, dtype=self.dtype)(x)
        out = jnp.concatenate([out, skip.astype(out.dtype)], axis=-1)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        return block(self.out_channels, self.kernel_size, 1, dtype=self.dtype)(out, train)


class UNETR(nn.Module):
    """UNETR (reference unetr_block.py:635): ViT trunk with skips tapped at
    transformer layers 3/6/9 and the final normed output, convolutional
    encoders per tap, and a transpose-conv decoder.

    Patch size is fixed at 16 as in the reference; num_layers fixed at 12."""

    out_chans: int
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    pos_embed: str = "conv"
    conv_block: bool = True
    res_block: bool = True
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    dtype: str = None  # opt-in bf16 compute (norm stats + softmax f32;
    # f32 logits out)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, _ = x.shape
        if hh % 16 or ww % 16:
            raise ValueError("UNETR requires H and W divisible by the fixed patch size 16")
        fh, fw = hh // 16, ww // 16

        def proj_feat(tokens):
            return tokens.reshape(b, fh, fw, self.hidden_size)

        normed, hidden = ViT(
            patch_size=16,
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            num_layers=12,
            num_heads=self.num_heads,
            pos_embed=self.pos_embed,
            dropout_rate=self.dropout_rate,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
        )(x, train)

        f = self.feature_size
        basic = UnetResBlock if self.res_block else UnetBasicBlock
        enc1 = basic(f, 3, 1, dtype=self.dtype)(x, train)
        enc2 = UnetrPrUpBlock(f * 2, num_layer=2, conv_block=self.conv_block, res_block=self.res_block,
                              dtype=self.dtype)(proj_feat(hidden[3]), train)
        enc3 = UnetrPrUpBlock(f * 4, num_layer=1, conv_block=self.conv_block, res_block=self.res_block,
                              dtype=self.dtype)(proj_feat(hidden[6]), train)
        enc4 = UnetrPrUpBlock(f * 8, num_layer=0, conv_block=self.conv_block, res_block=self.res_block,
                              dtype=self.dtype)(proj_feat(hidden[9]), train)
        dec4 = proj_feat(normed)
        dec3 = UnetrUpBlock(f * 8, res_block=self.res_block, dtype=self.dtype)(dec4, enc4, train)
        dec2 = UnetrUpBlock(f * 4, res_block=self.res_block, dtype=self.dtype)(dec3, enc3, train)
        dec1 = UnetrUpBlock(f * 2, res_block=self.res_block, dtype=self.dtype)(dec2, enc2, train)
        out = UnetrUpBlock(f, res_block=self.res_block, dtype=self.dtype)(dec1, enc1, train)
        return UnetOutBlock(self.out_chans, dtype=self.dtype)(out)


class Conv3dBlock(nn.Module):
    """Conv3d(3, no bias) + InstanceNorm3d + LeakyReLU(0.2) + Dropout, x2
    (reference segmentation/nn/unet3d_base/unet3d_block.py:8)."""

    out_chans: int
    drop_prob: float = 0.0
    dtype: str = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.out_chans, (3, 3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = InstanceNorm()(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.drop_prob, deterministic=not train)(x)
        return x


class TransposeConv3dBlock(nn.Module):
    """ConvTranspose3d((1,2,2), no bias) + InstanceNorm3d + LeakyReLU(0.2)
    (reference unet3d_block.py:44) — upsampling in-plane only, depth kept."""

    out_chans: int
    dtype: str = None

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.out_chans, (1, 2, 2), strides=(1, 2, 2), use_bias=False, dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        return nn.leaky_relu(x, 0.2)


class UNet3D(nn.Module):
    """3D UNet over [B, D, H, W, C] volumes — the fastMRI UNet pattern with
    3D blocks, in-plane (1,2,2) pooling/up-sampling, and reflect padding for
    odd sizes (reference unet3d_block.py:72-170)."""

    out_chans: int
    chans: int = 16
    num_pool_layers: int = 3
    drop_prob: float = 0.0
    dtype: str = None  # opt-in bf16 conv compute; f32 logits out

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ch = self.chans
        stack = []
        out = x
        for i in range(self.num_pool_layers):
            out = Conv3dBlock(ch, self.drop_prob, dtype=self.dtype)(out, train)
            stack.append(out)
            out = nn.avg_pool(out, (1, 2, 2), strides=(1, 2, 2))
            if i < self.num_pool_layers - 1:
                ch *= 2
        out = Conv3dBlock(ch * 2, self.drop_prob, dtype=self.dtype)(out, train)

        for i in range(self.num_pool_layers):
            skip = stack.pop()
            out = TransposeConv3dBlock(ch, dtype=self.dtype)(out)
            pads = [(0, skip.shape[d] - out.shape[d]) for d in (1, 2, 3)]
            if any(p[1] for p in pads):
                out = jnp.pad(out, ((0, 0), *pads, (0, 0)), mode="reflect")
            out = Conv3dBlock(ch, self.drop_prob, dtype=self.dtype)(jnp.concatenate([out, skip], -1), train)
            if i < self.num_pool_layers - 1:
                ch //= 2
        out = nn.Conv(self.out_chans, (1, 1, 1), dtype=self.dtype)(out)
        return out if self.dtype is None else out.astype(jnp.float32)

