"""Segmentation model zoo.

Functional parity with reference: mridc/collections/segmentation/nn/
(``SegmentationUNet`` unet.py:17, ``Segmentation3DUNet`` unet3d.py:17,
``SegmentationAttentionUNet`` attention_unet.py:17, ``SegmentationLambdaUNet``
lambda_unet.py:17, ``SegmentationVNet`` vnet.py:19, ``SegmentationDYNUNet``
dynunet.py:17, ``SegmentationUNetR`` unetr.py:17).

Contract: ``model.apply(vars, image, train=...)`` with image [B, H, W, C_in]
(magnitude 1ch or complex rv 2ch; reference nn/base.py:46-52) -> logits
[B, H, W, n_classes]; class axis last. Softmax/normalization is applied by the
loss/eval side (reference normalize_segmentation_output).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mridc_tpu.nn.seg_blocks import (
    AttentionUnet,
    DynUNet,
    LambdaUnet,
    UNETR,
    UNet3D,
    VNet,
)
from mridc_tpu.nn.unet import Unet

__all__ = [
    "SegmentationUNet",
    "Segmentation3DUNet",
    "SegmentationAttentionUNet",
    "SegmentationLambdaUNet",
    "SegmentationVNet",
    "SegmentationDYNUNet",
    "SegmentationUNetR",
]


def _seg_cfg(cfg):
    chans = cfg.get("segmentation_module_channels", 32)
    pools = cfg.get("segmentation_module_pooling_layers", 4)
    if isinstance(chans, (list, tuple)):
        # reference DynUNet-style configs give per-stage channel lists
        # (e.g. [32, 64, 128]); our blocks double per stage from the base
        pools = max(len(chans) - 1, 1)
        chans = int(chans[0])
    return dict(
        classes=cfg.get("segmentation_module_output_channels", cfg.get("output_classes", 2)),
        chans=chans,
        pools=pools,
    )


class _SegBase(nn.Module):
    classes: int = 2
    chans: int = 32
    pools: int = 4
    normalize_output: bool = False
    live_bn: bool = False  # train_batch_stats: track running BatchNorm stats
    compute_dtype: str = None  # opt-in bf16 conv compute — every trunk honors
    # it (norm stats, softmaxes and logits stay f32; params stay f32)

    def _maybe_norm(self, logits):
        if self.normalize_output:
            return jax.nn.softmax(logits, axis=-1)
        return logits


class SegmentationUNet(_SegBase):
    @classmethod
    def from_config(cls, cfg):
        return cls(**_seg_cfg(cfg), compute_dtype=cfg.get("compute_dtype"))

    @nn.compact
    def __call__(self, image, train: bool = False):
        return Unet(
            out_chans=self.classes, chans=self.chans, num_pool_layers=self.pools,
            dtype=self.compute_dtype,
        )(image, train)


class Segmentation3DUNet(_SegBase):
    @classmethod
    def from_config(cls, cfg):
        return cls(**_seg_cfg(cfg), compute_dtype=cfg.get("compute_dtype"))

    @nn.compact
    def __call__(self, image, train: bool = False):
        return UNet3D(
            out_chans=self.classes, chans=self.chans, num_pool_layers=self.pools,
            dtype=self.compute_dtype,
        )(image, train)


class SegmentationAttentionUNet(_SegBase):
    @classmethod
    def from_config(cls, cfg):
        return cls(**_seg_cfg(cfg), compute_dtype=cfg.get("compute_dtype"))

    @nn.compact
    def __call__(self, image, train: bool = False):
        return AttentionUnet(
            out_chans=self.classes, chans=self.chans, num_pool_layers=self.pools,
            dtype=self.compute_dtype,
        )(image, train)


class SegmentationLambdaUNet(_SegBase):
    query_depth: int = 16
    intra_depth: int = 1
    receptive_kernel: int = 3
    temporal_kernel: int = 1
    num_slices: int = 1

    @classmethod
    def from_config(cls, cfg):
        return cls(
            **_seg_cfg(cfg),
            compute_dtype=cfg.get("compute_dtype"),
            query_depth=cfg.get("segmentation_module_query_depth", 16),
            intra_depth=cfg.get("segmentation_module_intra_depth", 1),
            receptive_kernel=cfg.get("segmentation_module_receptive_kernel", 3),
            temporal_kernel=cfg.get("segmentation_module_temporal_kernel", 1),
            num_slices=cfg.get("consecutive_slices", 1),
            live_bn=bool(cfg.get("train_batch_stats", False)),
        )

    @nn.compact
    def __call__(self, image, train: bool = False):
        return LambdaUnet(
            out_chans=self.classes,
            chans=self.chans,
            num_pool_layers=self.pools,
            query_depth=self.query_depth,
            intra_depth=self.intra_depth,
            receptive_kernel=self.receptive_kernel,
            temporal_kernel=self.temporal_kernel,
            num_slices=self.num_slices,
            live_bn=self.live_bn,
            dtype=self.compute_dtype,
        )(image, train)


class SegmentationVNet(_SegBase):
    @classmethod
    def from_config(cls, cfg):
        return cls(**_seg_cfg(cfg), compute_dtype=cfg.get("compute_dtype"),
                   live_bn=bool(cfg.get("train_batch_stats", False)))

    @nn.compact
    def __call__(self, image, train: bool = False):
        return VNet(out_chans=self.classes, live_bn=self.live_bn, dtype=self.compute_dtype)(image, train)


class SegmentationDYNUNet(_SegBase):
    kernel_size: tuple = (3, 3, 3, 3)
    strides: tuple = (1, 2, 2, 2)
    filters: tuple = None
    deep_supervision: bool = False
    deep_supr_num: int = 1

    @classmethod
    def from_config(cls, cfg):
        filters = cfg.get("segmentation_module_channels")
        strides = cfg.get("segmentation_module_strides", (1, 2, 2, 2))
        base = _seg_cfg(cfg)
        return cls(
            classes=base["classes"],
            compute_dtype=cfg.get("compute_dtype"),
            kernel_size=tuple(cfg.get("segmentation_module_kernel_size", (3,) * len(strides))),
            strides=tuple(strides),
            filters=tuple(filters) if isinstance(filters, (list, tuple)) else None,
            deep_supervision=cfg.get("segmentation_module_deep_supervision", False),
            deep_supr_num=cfg.get("segmentation_module_deep_supervision_levels", 1),
        )

    @nn.compact
    def __call__(self, image, train: bool = False):
        return DynUNet(
            out_chans=self.classes,
            kernel_size=self.kernel_size,
            strides=self.strides,
            filters=self.filters,
            deep_supervision=self.deep_supervision,
            deep_supr_num=self.deep_supr_num,
            dtype=self.compute_dtype,
        )(image, train)


class SegmentationUNetR(_SegBase):
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    pos_embed: str = "conv"
    conv_block: bool = True
    res_block: bool = True
    qkv_bias: bool = False

    @classmethod
    def from_config(cls, cfg):
        base = _seg_cfg(cfg)
        return cls(
            classes=base["classes"],
            compute_dtype=cfg.get("compute_dtype"),
            chans=cfg.get("segmentation_module_channels", 64),
            hidden_size=cfg.get("segmentation_module_hidden_size", 768),
            mlp_dim=cfg.get("segmentation_module_mlp_dim", 3072),
            num_heads=cfg.get("segmentation_module_num_heads", 12),
            pos_embed=cfg.get("segmentation_module_pos_embed", "conv"),
            conv_block=cfg.get("segmentation_module_conv_block", True),
            res_block=cfg.get("segmentation_module_res_block", True),
            qkv_bias=cfg.get("segmentation_module_qkv_bias", False),
        )

    @nn.compact
    def __call__(self, image, train: bool = False):
        return UNETR(
            out_chans=self.classes,
            feature_size=self.chans,
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            num_heads=self.num_heads,
            pos_embed=self.pos_embed,
            conv_block=self.conv_block,
            res_block=self.res_block,
            qkv_bias=self.qkv_bias,
            dtype=self.compute_dtype,
        )(image, train)

