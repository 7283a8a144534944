"""Joint reconstruction + segmentation models.

Functional parity with reference (mridc/collections/multitask/rs/nn/):
  - ``MTLRS`` mtlrs.py:20 + mtlrs_base/mtlrs_block.py:20 — rs_cascades of
    (CIRIM reconstruction + segmentation module) with multi-task feature
    sharing: |recon x seg| tiled into the next cascade's RIM hidden states.
  - ``IDSLR`` idslr.py:19 / ``IDSLRUNet`` idslr_unet.py:20 — shared UNet
    encoder, separate recon/seg decoders, weighted k-space DC per iteration.
  - ``SegNet`` segnet.py:21 — per-iteration encoder/decoder/seg-decoder stacks
    + final 1x1 over concatenated segmentations.
  - ``RecSegUNet`` recseg_unet.py:18 — recon UNet -> (no-grad groupnorm) ->
    seg UNet.
  - ``SERANet`` seranet.py:27 — recon module, then a recurrent
    segmentation-aware refinement with DC using the reference's ConvLSTM cell
    (nn/convlstm.py, golden-tested in test_golden_seranet.py).

Contract: ``__call__(y, sens, mask, init_pred=None, train=False) ->
(ModelOutput, seg_logits [B, H, W, classes])``; SegNet in train mode returns
the stacked per-cascade + fused segmentations [N, B, H, W, classes] for the
reference's per-cascade loss averaging. Seg inputs are group-normed
under stop_gradient exactly like the reference's ``torch.no_grad`` group_norm
(seg loss does not backprop into the recon trunk).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mridc_tpu.models.base import BaseReconModel, ModelOutput, check_dc_mode, expand_mask
from mridc_tpu.models.multitask.blocks import KSpaceDC, UnetDecoder, UnetEncoder, apply_group_norm
from mridc_tpu.nn.dc import sens_expand, sens_reduce
from mridc_tpu.nn.rim import RIMBlock
from mridc_tpu.nn.rnn_cells import ConvGRUCell
from mridc_tpu.nn.seg_blocks import AttentionUnet, LambdaUnet, VNet
from mridc_tpu.nn.unet import Unet
from mridc_tpu.ops.cplx import cabs, ccombine
from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

__all__ = ["MTLRS", "IDSLR", "IDSLRUNet", "SegNet", "RecSegUNet", "SERANet"]


def _norm_by_max(s):
    """Reference ``x / torch.max(x)`` — SIGNED max (an all-negative map flips
    sign, e.g. segnet.py:202, idslr.py:246); guarded only at |max| ~ 0. The
    round-2 ``maximum(max, 1e-12)`` clamp instead exploded all-negative maps
    to ~1e12-scale logits."""
    m = s.max()
    m = jnp.where(jnp.abs(m) < 1e-12, 1.0, m)
    return s / m


def _group_norm_nograd(x: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """torch.no_grad F.group_norm equivalent (channel groups over the last
    axis for NHWC inputs): normalize + stop_gradient. Stats always run in
    f32 (bf16 feature stacks are normalized exactly); output is f32."""
    return jax.lax.stop_gradient(apply_group_norm(x.astype(jnp.float32), groups))


def _make_seg_module(
    kind: str,
    classes: int,
    chans: int,
    pools: int,
    live_bn: bool = False,
    remat: bool = False,
    index: int = None,
):
    """Build the per-cascade segmentation head. With ``remat`` the module is
    wrapped in nn.remat (backward recomputes the seg activations instead of
    storing rs_cascades x UNet trunks — value-exact) under an EXPLICIT name
    equal to what flax auto-naming would have produced, so the param tree —
    and therefore checkpoints and the torch importers — are unchanged.
    live_bn (mutable batch_stats) opts out: lifted remat and mutable
    collections don't mix."""
    kind = str(kind).lower()
    if kind == "unet":
        cls, kw = Unet, dict(out_chans=classes, chans=chans, num_pool_layers=pools)
    elif kind == "attentionunet":
        cls, kw = AttentionUnet, dict(out_chans=classes, chans=chans, num_pool_layers=pools)
    elif kind == "lambdaunet":
        cls, kw = LambdaUnet, dict(out_chans=classes, chans=chans, num_pool_layers=pools, live_bn=live_bn)
    elif kind == "vnet":
        cls, kw = VNet, dict(out_chans=classes, live_bn=live_bn)
    else:
        raise ValueError(f"Unknown segmentation module {kind!r}")
    if remat and not live_bn:
        # static_argnums=(2,): the `train` flag (args[0] is the lifted scope,
        # args[1] the input tensor) — modules branch on it in python
        return nn.remat(cls, prevent_cse=False, static_argnums=(2,))(
            **kw, name=f"{cls.__name__}_{index}"
        )
    return cls(**kw)


class MTLRS(BaseReconModel):
    rs_cascades: int = 5
    recon_num_cascades: int = 1
    recon_time_steps: int = 8
    recon_recurrent_layer: str = "IndRNN"
    recon_conv_filters: Sequence[int] = (64, 64, 2)
    recon_recurrent_filters: Sequence[int] = (64, 64, 0)
    seg_module: str = "attentionunet"
    live_bn: bool = False  # train_batch_stats for BN-bearing seg modules (vnet/lambdaunet)
    seg_classes: int = 2
    seg_channels: int = 32
    seg_pools: int = 2
    input_channels: int = 2
    magnitude_input: bool = False
    normalize_segmentation_output: bool = True
    task_adaption_type: str = "multi_task_learning"
    dc_mode: str = "full"  # "psf1d": exact DC fast path for 1D column masks
    # (see nn/dc.py psf1d_gauss_mats; same semantics as CIRIM's dc_mode)
    compute_dtype: str = None  # opt-in bf16 compute for the RECON trunk's
    # conv/RNN stack (same knob/cert as CIRIM; the seg head stays f32 — it is
    # a small fraction of the step). Params stay f32.
    lane_fold: str = "auto"  # MXU lane folding for the recon trunk (nn/fold.py)
    train_dc_dtype: str = None  # psf1d DC chain dtype in train mode;
    infer_dc_dtype: str = None  # ... and at inference. Both default to
    # compute_dtype in from_config, like CIRIM (null forces f32).

    @classmethod
    def from_config(cls, cfg):
        return cls(
            dc_mode=check_dc_mode(str(cfg.get("dc_mode", "full")).lower()),
            compute_dtype=cfg.get("compute_dtype", None),
            lane_fold=str(cfg.get("lane_fold", "auto")).lower(),
            train_dc_dtype=(
                cfg["train_dc_dtype"] if "train_dc_dtype" in cfg else cfg.get("compute_dtype")
            ),
            infer_dc_dtype=(
                cfg["infer_dc_dtype"] if "infer_dc_dtype" in cfg else cfg.get("compute_dtype")
            ),
            rs_cascades=cfg.get("joint_reconstruction_segmentation_module_cascades", 5),
            recon_num_cascades=cfg.get("reconstruction_module_num_cascades", 1),
            recon_time_steps=cfg.get("reconstruction_module_time_steps", 8),
            recon_recurrent_layer=cfg.get("reconstruction_module_recurrent_layer", "IndRNN"),
            recon_conv_filters=tuple(cfg.get("reconstruction_module_conv_filters", (64, 64, 2))),
            recon_recurrent_filters=tuple(cfg.get("reconstruction_module_recurrent_filters", (64, 64, 0))),
            seg_module=cfg.get("segmentation_module", "attentionunet"),
            live_bn=bool(cfg.get("train_batch_stats", False)),
            seg_classes=cfg.get("segmentation_module_output_channels", 2),
            seg_channels=cfg.get("segmentation_module_channels", 32),
            seg_pools=cfg.get("segmentation_module_pooling_layers", 2),
            input_channels=cfg.get("segmentation_module_input_channels", 2),
            magnitude_input=cfg.get("magnitude_input", False),
            normalize_segmentation_output=cfg.get("normalize_segmentation_output", True),
            task_adaption_type=cfg.get("task_adaption_type", "multi_task_learning"),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False):
        mask = expand_mask(mask)
        # Reference eta semantics (mtlrs.py:139-179 + rim_block.py:202,226):
        # a valid init prediction is the eta of EVERY cascade in the block; the
        # last cascade's final estimate becomes the next rs-block's init (with
        # gradient). Without an init, cascade 0 SENSE-inits from y and later
        # cascades start from the previous final eta DETACHED. The hidden
        # state threads through cascades AND rs-blocks.
        init_eta = init_pred if (init_pred is not None and init_pred.ndim >= 4) else None
        hx = None
        all_recons = []
        seg = None
        for rs_i in range(self.rs_cascades):
            # reconstruction trunk: CIRIM cascades with threaded hidden state
            cascade_etas = []
            eta = None
            for c in range(self.recon_num_cascades):
                block = RIMBlock(
                    recurrent_layer=self.recon_recurrent_layer,
                    conv_filters=self.recon_conv_filters,
                    recurrent_filters=self.recon_recurrent_filters,
                    time_steps=self.recon_time_steps,
                    no_dc=True,
                    fft_centered=self.fft_centered,
                    fft_normalization=self.fft_normalization,
                    spatial_dims=self.spatial_dims,
                    coil_dim=self.coil_dim,
                    compute_dtype=self.compute_dtype,
                    lane_fold=self.lane_fold,
                    dc_psf1d=self.dc_mode == "psf1d",
                    dc_dtype=self.train_dc_dtype if train else self.infer_dc_dtype,
                    pointwise_matmul=train,
                )
                if init_eta is not None:
                    eta_in = init_eta
                elif c == 0:
                    eta_in = None  # SENSE init from y inside the block
                else:
                    eta_in = jax.lax.stop_gradient(eta)
                etas, eta, hx = block(y, sens, mask, eta=eta_in, hx=hx, return_hx=True)
                cascade_etas.append(etas)
            init_eta = eta  # next rs-block starts from this block's estimate
            all_recons.append(jnp.stack(cascade_etas, 0))  # [C, T, B, H, W, 2]

            # segmentation head on the (no-grad group-normed) reconstruction
            if self.input_channels == 2 and self.magnitude_input:
                raise ValueError(
                    "Magnitude input is not supported for 2-channel input "
                    "(reference mtlrs_base/mtlrs_block.py:312)"
                )
            if self.input_channels == 1 or self.magnitude_input:
                seg_in = cabs(eta)[..., None]
            else:
                seg_in = eta
            seg_in = _group_norm_nograd(seg_in)
            seg = _make_seg_module(self.seg_module, self.seg_classes, self.seg_channels, self.seg_pools,
                                   live_bn=self.live_bn, remat=train, index=rs_i)(
                seg_in, train
            )
            seg = jnp.abs(seg)
            if self.normalize_segmentation_output:
                seg = _norm_by_max(seg)

            # task adaption: feed |recon * seg| into the next cascade's hidden state
            if self.task_adaption_type == "multi_task_learning" and hx is not None:
                from mridc_tpu.nn.fold import fold_w, unfold_w

                recon_mag = cabs(eta)[..., None]  # [B, H, W, 1]
                shared = jnp.abs(recon_mag * seg)  # [B, H, W, classes]
                new_hx = []
                for h in hx:
                    # with lane folding active the RIMBlock carries hidden
                    # states as [B, H, W/2, 2f]; apply the adaption in the
                    # unfolded layout (exact) and refold
                    folded = h.shape[2] * 2 == shared.shape[2]
                    hu = unfold_w(h) if folded else h
                    reps = hu.shape[-1] // self.seg_classes
                    tiled = jnp.tile(shared, (1, 1, 1, max(reps, 1)))
                    if tiled.shape[-1] < hu.shape[-1]:
                        tiled = jnp.pad(tiled, ((0, 0),) * 3 + ((0, hu.shape[-1] - tiled.shape[-1]),))
                    hu = hu + tiled[..., : hu.shape[-1]].astype(hu.dtype)
                    new_hx.append(fold_w(hu) if folded else hu)
                hx = tuple(new_hx)

        intermediates = jnp.concatenate(all_recons, 0)
        return ModelOutput(prediction=eta, intermediates=intermediates), seg


class IDSLR(BaseReconModel):
    """Image-domain Deep Structured Low-Rank network: shared UNet encoder,
    recon decoder + seg decoder, weighted k-space DC per iteration.

    Functional parity with reference:
    mridc/collections/multitask/rs/nn/idslr.py:19 (iteration loop :141-160,
    no-grad group-normed encoder stack into the seg decoder :165-173) and
    idslr_base/idslr_block.py (normalize=True/padding=True defaults).
    IDSLRUNet (idslr_unet.py:20) instead segments the final coil-channelized
    reconstruction with a full UNet (:164-177).
    """

    num_iters: int = 5
    chans: int = 32
    num_pools: int = 4
    seg_classes: int = 2
    seg_head: str = "decoder"  # "decoder" (IDSLR) | "unet" (IDSLRUNet)
    magnitude_input: bool = True
    norm_groups: int = 2
    normalize: bool = True
    padding: bool = True
    padding_size: int = 11
    normalize_segmentation_output: bool = True
    compute_dtype: str = None  # opt-in bf16 conv compute for the shared
    # encoder/decoders and seg head; k-space DC/FFT chain and the group
    # normalizations stay f32, params stay f32

    @classmethod
    def from_config(cls, cfg):
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            num_iters=cfg.get("num_iters", 5),
            chans=cfg.get("channels", cfg.get("segmentation_module_channels", 32)),
            num_pools=cfg.get("num_pools", cfg.get("segmentation_module_pooling_layers", 4)),
            seg_classes=cfg.get("segmentation_module_output_channels", 2),
            magnitude_input=cfg.get("magnitude_input", True),
            norm_groups=cfg.get("norm_groups", 2),
            normalize=cfg.get("normalize", True),
            padding=cfg.get("padding", True),
            padding_size=cfg.get("padding_size", 11),
            normalize_segmentation_output=cfg.get("normalize_segmentation_output", True),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False):
        del init_pred
        mask = expand_mask(mask)
        coils = y.shape[1]
        encoder = UnetEncoder(
            chans=self.chans,
            num_pools=self.num_pools,
            normalize=self.normalize,
            padding=self.padding,
            padding_size=self.padding_size,
            norm_groups=self.norm_groups,
            dtype=self.compute_dtype,
        )
        recon_decoder = UnetDecoder(
            out_chans=2 * coils,
            chans=self.chans,
            num_pools=self.num_pools,
            normalize=self.normalize,
            padding=self.padding,
            norm_groups=self.norm_groups,
            dtype=self.compute_dtype,
        )
        if self.seg_head == "unet":
            seg_module = Unet(
                out_chans=self.seg_classes, chans=self.chans, num_pool_layers=self.num_pools,
                dtype=self.compute_dtype,
            )
        else:
            seg_module = UnetDecoder(
                out_chans=self.seg_classes,
                chans=self.chans,
                num_pools=self.num_pools,
                normalize=self.normalize,
                padding=self.padding,
                norm_groups=self.norm_groups,
                dtype=self.compute_dtype,
            )
        dc = KSpaceDC()

        y_pred = y
        stack = pad_sizes = None
        for _ in range(self.num_iters):
            img = ifft2_rv(y_pred, self.fft_centered, self.fft_normalization, self.spatial_dims)
            x = _coils_to_channels(img)
            stack, pad_sizes, mean, std = encoder(x, train)
            delta = recon_decoder(stack, pad_sizes, mean, std, train)
            recon = _channels_to_coils(delta) + img
            pred_k = fft2_rv(recon, self.fft_centered, self.fft_normalization, self.spatial_dims)
            y_pred = dc(pred_k, y, mask)

        image = ifft2_rv(y_pred, self.fft_centered, self.fft_normalization, self.spatial_dims)
        prediction = ccombine(image, sens, self.coil_combination_method, self.coil_dim)

        if self.seg_head == "unet":
            # reference idslr_unet.py:164-173: final coil-channelized recon,
            # no-grad group norm (+ magnitude), through a full UNet
            seg_in = _group_norm_nograd(_coils_to_channels(image), self.norm_groups)
            if self.magnitude_input:
                seg_in = jnp.abs(seg_in)
            seg = seg_module(seg_in, train)
        else:
            # reference idslr.py:165-173: no-grad group-normed encoder stack
            seg_stack = [_group_norm_nograd(s, self.norm_groups) for s in stack]
            if self.magnitude_input:
                seg_stack = [jnp.abs(s) for s in seg_stack]
            seg = seg_module(seg_stack, pad_sizes, None, None, train)
        seg = jnp.abs(seg)
        if self.normalize_segmentation_output:
            seg = _norm_by_max(seg)
        return ModelOutput(prediction=prediction), seg


class IDSLRUNet(IDSLR):
    """IDSLR variant with a full UNet as the segmentation head
    (reference idslr_unet.py:20)."""

    seg_head: str = "unet"


class SegNet(BaseReconModel):
    """Per-iteration encoders/decoders/seg-decoders + final replication-padded
    conv over the concatenated segmentations.

    Functional parity with reference:
    mridc/collections/multitask/rs/nn/segnet.py:21 (normalize=False/
    padding=False defaults :50-52, per-cascade modules :56-100, final
    ConvNonlinear :102-112, forward :170-205). Eval returns the final fused
    segmentation; train returns the stacked per-cascade + fused segmentations
    so the trainer averages the per-cascade losses like the reference
    (segnet.py:213-251).
    """

    num_iters: int = 2
    chans: int = 32
    num_pools: int = 4
    seg_classes: int = 2
    norm_groups: int = 2
    normalize: bool = False
    padding: bool = False
    padding_size: int = 11
    magnitude_input: bool = True
    seg_final_kernel: int = 3
    seg_final_bias: bool = False
    seg_final_nonlinear: str = "relu"
    normalize_segmentation_output: bool = True
    compute_dtype: str = None  # opt-in bf16 conv compute (DC/FFT stay f32)

    @classmethod
    def from_config(cls, cfg):
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            num_iters=cfg.get("num_cascades", cfg.get("num_iters", 2)),
            chans=cfg.get("channels", cfg.get("segmentation_module_channels", 32)),
            num_pools=cfg.get("num_pools", cfg.get("segmentation_module_pooling_layers", 4)),
            seg_classes=cfg.get("segmentation_module_output_channels", 2),
            norm_groups=cfg.get("norm_groups", 2),
            normalize=cfg.get("normalize", False),
            padding=cfg.get("padding", False),
            padding_size=cfg.get("padding_size", 11),
            magnitude_input=cfg.get("magnitude_input", True),
            seg_final_kernel=cfg.get("segmentation_final_layer_kernel_size", 3),
            seg_final_bias=cfg.get("segmentation_final_layer_bias", False),
            seg_final_nonlinear=cfg.get("segmentation_final_layer_nonlinear", "relu"),
            normalize_segmentation_output=cfg.get("normalize_segmentation_output", True),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False):
        from mridc_tpu.nn.layers import ConvNonlinear

        del init_pred
        mask = expand_mask(mask)
        coils = y.shape[1]
        dc = KSpaceDC()  # single shared DC across cascades (reference segnet.py:112)
        y_pred = y
        segs = []
        for _ in range(self.num_iters):
            img = ifft2_rv(y_pred, self.fft_centered, self.fft_normalization, self.spatial_dims)
            x = _coils_to_channels(img)
            stack, pad_sizes, mean, std = UnetEncoder(
                chans=self.chans,
                num_pools=self.num_pools,
                normalize=self.normalize,
                padding=self.padding,
                padding_size=self.padding_size,
                norm_groups=self.norm_groups,
                dtype=self.compute_dtype,
            )(x, train)
            seg_stack = [_group_norm_nograd(s, self.norm_groups) for s in stack]
            if self.magnitude_input:
                seg_stack = [jnp.abs(s) for s in seg_stack]
            segs.append(
                UnetDecoder(
                    out_chans=self.seg_classes,
                    chans=self.chans,
                    num_pools=self.num_pools,
                    normalize=self.normalize,
                    padding=self.padding,
                    norm_groups=self.norm_groups,
                    dtype=self.compute_dtype,
                )(seg_stack, pad_sizes, None, None, train)
            )
            delta = UnetDecoder(
                out_chans=2 * coils,
                chans=self.chans,
                num_pools=self.num_pools,
                normalize=self.normalize,
                padding=self.padding,
                norm_groups=self.norm_groups,
                dtype=self.compute_dtype,
            )(stack, pad_sizes, mean, std, train)
            # NOTE: unlike IDSLR, the reference SegNet does NOT add the
            # zero-filled image back (segnet.py:186-193 — no residual)
            recon = _channels_to_coils(delta)
            pred_k = fft2_rv(recon, self.fft_centered, self.fft_normalization, self.spatial_dims)
            y_pred = dc(pred_k, y, mask)

        image = ifft2_rv(y_pred, self.fft_centered, self.fft_normalization, self.spatial_dims)
        prediction = ccombine(image, sens, self.coil_combination_method, self.coil_dim)
        seg = ConvNonlinear(
            self.seg_classes,
            kernel_size=self.seg_final_kernel,
            use_bias=self.seg_final_bias,
            nonlinear=self.seg_final_nonlinear,
            dtype=self.compute_dtype,
        )(jnp.concatenate(segs, axis=-1)).astype(jnp.float32)
        segs.append(seg)  # reference appends the fused seg to the list (segnet.py:198-199)
        if self.normalize_segmentation_output:
            segs = [_norm_by_max(s) for s in segs]
        if train:
            # reference trains on the per-cascade list + fused seg, averaging
            # the losses over the stack (segnet.py:213-251); eval uses the
            # fused (last) one only
            return ModelOutput(prediction=prediction), jnp.stack(segs, axis=0)
        return ModelOutput(prediction=prediction), segs[-1]


class RecSegUNet(BaseReconModel):
    """Recon UNet -> (no-grad norm) -> Seg UNet (reference recseg_unet.py:18)."""

    recon_chans: int = 64
    recon_pools: int = 2
    seg_chans: int = 64
    seg_pools: int = 2
    seg_classes: int = 2
    input_channels: int = 1
    normalize_segmentation_output: bool = True
    compute_dtype: str = None  # opt-in bf16 compute for both UNets

    @classmethod
    def from_config(cls, cfg):
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            recon_chans=cfg.get("reconstruction_module_channels", 64),
            recon_pools=cfg.get("reconstruction_module_pooling_layers", 2),
            seg_chans=cfg.get("segmentation_module_channels", 64),
            seg_pools=cfg.get("segmentation_module_pooling_layers", 2),
            seg_classes=cfg.get("segmentation_module_output_channels", 2),
            input_channels=cfg.get("segmentation_module_input_channels", 1),
            normalize_segmentation_output=cfg.get("normalize_segmentation_output", True),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False):
        del mask
        if init_pred is None or init_pred.ndim < 4:
            init_pred = self.zero_filled(y, sens)
        x = cabs(init_pred)[..., None] if self.input_channels == 1 else init_pred
        recon = Unet(
            out_chans=x.shape[-1], chans=self.recon_chans, num_pool_layers=self.recon_pools,
            dtype=self.compute_dtype,
        )(x, train)
        seg_in = _group_norm_nograd(recon)
        seg = Unet(
            out_chans=self.seg_classes, chans=self.seg_chans, num_pool_layers=self.seg_pools,
            dtype=self.compute_dtype,
        )(seg_in, train)
        seg = jnp.abs(seg)
        if self.normalize_segmentation_output:
            seg = _norm_by_max(seg)
        pred = recon[..., 0] if recon.shape[-1] == 1 else recon
        if pred.ndim == 3:
            pred = jnp.stack([pred, jnp.zeros_like(pred)], -1)
        return ModelOutput(prediction=pred), seg


def _coils_to_channels(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W, 2] -> [B, H, W, 2C], channels ordered (re coils.., im coils..)
    — NHWC analogue of the reference's complex_to_chan_dim (recon_block.py:330)."""
    return jnp.concatenate([x[..., 0], x[..., 1]], axis=1).transpose(0, 2, 3, 1)


def _channels_to_coils(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_coils_to_channels`."""
    x = x.transpose(0, 3, 1, 2)
    c = x.shape[1] // 2
    return jnp.stack([x[:, :c], x[:, c:]], axis=-1)


class SERANetDC(nn.Module):
    """SERANet soft-DC block (reference seranet_base/recon_block.py:12):
    ``prev - where(mask, F(pred) - y, 0)*w - F(pred)`` then iFFT. Note the
    reference feeds the *image-domain* previous output back as ``prev`` after
    the first iteration while subtracting k-space terms — an upstream quirk
    mirrored exactly (verified by golden test)."""

    fft_centered: bool = False
    fft_normalization: str = "backward"
    spatial_dims: tuple = (-2, -1)

    @nn.compact
    def __call__(self, prediction, prev_prediction, ref_kspace, mask):
        w = self.param("dc_weight", nn.initializers.ones, (1,))
        pred_k = fft2_rv(prediction, self.fft_centered, self.fft_normalization, self.spatial_dims)
        if pred_k.ndim < ref_kspace.ndim:
            pred_k = pred_k[:, None]
        soft_dc = jnp.where(mask.astype(bool), pred_k - ref_kspace, 0.0) * w
        out = prev_prediction - soft_dc - pred_k
        return ifft2_rv(out, self.fft_centered, self.fft_normalization, self.spatial_dims)


class SERANet(BaseReconModel):
    """End-to-End Recurrent Attention Network (reference seranet.py:27).

    Faithful structure: a reconstruction block of ``num_blocks`` shared-weight
    U-Net regularizer applications + per-block SERANetDC (recon_block.py:84);
    a ConvLSTMNormUnet segmentation module over the coil-channelized magnitude
    (convlstm_unet.py:13); and a recurrent attention refinement
    (recon_block.py:240): AttentionGate over the channelized multicoil
    reconstruction gated by the evolving attention map x segmentation, DC'd
    and re-segmented by a second ConvLSTMNormUnet for ``num_iterations``.
    """

    input_channels: int = 2
    recon_out_chans: int = 2
    recon_chans: int = 32
    recon_pools: int = 4
    num_blocks: int = 3
    seg_in_chans: int = 2
    seg_classes: int = 2
    seg_chans: int = 32
    seg_pools: int = 4
    num_iterations: int = 2
    attention_chans: int = 32
    attention_pools: int = 4
    normalize_segmentation_output: bool = True
    compute_dtype: str = None  # opt-in bf16 compute for the UNet regularizer
    # and both ConvLSTMNormUnets; the SERANet DC chain and the attention gate
    # stay f32

    @classmethod
    def from_config(cls, cfg):
        return cls(
            compute_dtype=cfg.get("compute_dtype"),
            input_channels=cfg.get("input_channels", 2),
            recon_out_chans=cfg.get("reconstruction_module_output_channels", 2),
            recon_chans=cfg.get("reconstruction_module_channels", 32),
            recon_pools=cfg.get("reconstruction_module_pooling_layers", 4),
            num_blocks=cfg.get("reconstruction_module_num_blocks", 3),
            seg_in_chans=cfg.get("segmentation_module_input_channels", 2),
            seg_classes=cfg.get("segmentation_module_output_channels", 2),
            seg_chans=cfg.get("segmentation_module_channels", 32),
            seg_pools=cfg.get("segmentation_module_pooling_layers", 4),
            num_iterations=cfg.get("recurrent_module_iterations", cfg.get("num_iterations", 2)),
            attention_chans=cfg.get("recurrent_module_attention_channels", 32),
            attention_pools=cfg.get("recurrent_module_attention_pooling_layers", 4),
            normalize_segmentation_output=cfg.get("normalize_segmentation_output", True),
            fft_centered=cfg.get("fft_centered", False),
            fft_normalization=cfg.get("fft_normalization", "backward"),
            spatial_dims=tuple(cfg.get("spatial_dims", (-2, -1))),
            coil_dim=cfg.get("coil_dim", 1),
            coil_combination_method=str(cfg.get("coil_combination_method", "SENSE")).upper(),
        )

    @nn.compact
    def __call__(self, y, sens, mask, init_pred=None, train: bool = False):
        from mridc_tpu.nn.convlstm import ConvLSTMNormUnet
        from mridc_tpu.nn.seg_blocks import AttentionGate

        mask = expand_mask(mask)
        m = mask[..., None]  # [B, 1, H, W, 1]
        pred0 = init_pred if (init_pred is not None and init_pred.ndim >= 4) else self.sense_init(y, sens)

        # ---- reconstruction block (recon_block.py:84): the reference stacks
        # the SAME regularizer instance num_blocks times over the SAME input,
        # so the U-Net runs once; only the per-block DC weights evolve.
        regularizer = Unet(
            out_chans=self.recon_out_chans, chans=self.recon_chans, num_pool_layers=self.recon_pools,
            dtype=self.compute_dtype,
        )
        unet_recon = regularizer(pred0, train)  # [B, H, W, 2]
        reconstructions = []
        prev = y
        for _ in range(self.num_blocks):
            prev = SERANetDC(self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))(unet_recon, prev, y, m)
            reconstructions.append(prev)  # [B, C, H, W, 2]
        pred_recon = reconstructions[-2] if len(reconstructions) > 1 else reconstructions[-1]

        # ---- segmentation module over |group_norm(last recon)| coil channels
        seg_in = _group_norm_nograd(reconstructions[-1])
        seg_in = cabs(seg_in)  # [B, C, H, W]
        num_coils = seg_in.shape[1]
        if num_coils < self.seg_in_chans:  # zero-coil padding (seranet.py:203-216)
            pad = self.seg_in_chans - num_coils
            seg_in = jnp.pad(seg_in, ((0, 0), (0, pad), (0, 0), (0, 0)))
            zc = ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
            pred_recon = jnp.pad(pred_recon, zc)
            y = jnp.pad(y, zc)
            sens = jnp.pad(sens, zc)
        segmentation = ConvLSTMNormUnet(
            chans=self.seg_chans, num_pools=self.seg_pools,
            in_chans=self.seg_in_chans, out_chans=self.seg_classes,
            dtype=self.compute_dtype,
        )(seg_in.transpose(0, 2, 3, 1), train)  # [B, H, W, classes]

        # ---- recurrent attention refinement (recon_block.py:240)
        attention_gate = AttentionGate(out_chans=self.seg_classes)
        recurrent_unet = ConvLSTMNormUnet(
            chans=self.attention_chans, num_pools=self.attention_pools,
            in_chans=self.seg_in_chans * 2, out_chans=self.seg_classes,
            dtype=self.compute_dtype,
        )
        dc = SERANetDC(self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        attention_map = segmentation
        prev = y
        for _ in range(self.num_iterations):
            gated = attention_gate(_coils_to_channels(pred_recon), attention_map * segmentation)
            att = _channels_to_coils(gated)  # [B, C, H, W, 2]
            att = dc(att, prev, y, m)
            prev = att
            attention_map = recurrent_unet(_coils_to_channels(att), train)
        pred_segmentation = jnp.abs(attention_map)
        if self.normalize_segmentation_output:
            pred_segmentation = _norm_by_max(pred_segmentation)

        recon_combined = ccombine(pred_recon, sens, self.coil_combination_method, dim=self.coil_dim)
        return ModelOutput(prediction=recon_combined), pred_segmentation
