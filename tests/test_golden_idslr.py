"""Golden parity for the IDSLR family against the reference's actual torch
modules with imported weights: idslr_block UnetEncoder/UnetDecoder/DC
(multitask/rs/nn/idslr_base/idslr_block.py:13,51,193), the composed IDSLR
iteration loop (idslr.py:141-173), IDSLRUNet's full-UNet segmentation head
(idslr_unet.py:75,164-177), SegNet's per-cascade graph + final ConvNonlinear
fusion (segnet.py:56-205), and RecSegUNet (recseg_unet.py:52-138)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

import reference_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    mods = {}
    mods["idslr_block"] = reference_loader.load("mridc.collections.multitask.rs.nn.idslr_base.idslr_block")
    mods["fft"] = reference_loader.load("mridc.collections.common.parts.fft")
    mods["utils"] = reference_loader.load("mridc.collections.common.parts.utils")
    mods["conv_layers"] = reference_loader.load("mridc.collections.reconstruction.nn.rim.conv_layers")
    mods["unet_block"] = reference_loader.load("mridc.collections.reconstruction.nn.unet_base.unet_block")
    return mods


def _sd(module):
    return {k: v.numpy() for k, v in module.state_dict().items()}


def _rand_rv(rng, shape):
    return rng.standard_normal(shape + (2,)).astype(np.float32)


B, C, H, W = 2, 2, 16, 16
CHANS, POOLS, GROUPS = 8, 2, 2


def _inputs(seed=3):
    rng = np.random.default_rng(seed)
    y = _rand_rv(rng, (B, C, H, W))
    sens = _rand_rv(rng, (B, C, H, W))
    sens /= np.sqrt((sens**2).sum(axis=(1, -1), keepdims=True))
    mask = (rng.random((B, 1, H, W, 1)) > 0.4).astype(np.float32)
    return y, sens, mask


def test_idslr_encoder_decoder_match_reference(ref):
    from mridc_tpu.models.multitask.blocks import UnetDecoder, UnetEncoder
    from mridc_tpu.utils.torch_import import import_idslr_decoder_params, import_idslr_encoder_params

    torch.manual_seed(0)
    tenc = ref["idslr_block"].UnetEncoder(
        chans=CHANS, num_pools=POOLS, in_chans=2 * C, normalize=True, padding=True, padding_size=11,
        norm_groups=GROUPS,
    )
    tdec = ref["idslr_block"].UnetDecoder(
        chans=CHANS, num_pools=POOLS, out_chans=2 * C, normalize=True, padding=True, padding_size=11,
        norm_groups=GROUPS,
    )
    y, _, _ = _inputs()
    x = torch.from_numpy(y)  # [B, C, H, W, 2] complex-last input
    with torch.no_grad():
        stack, iscomplex, pad_sizes, mean, std = tenc(x)
        want = tdec(list(stack), iscomplex, pad_sizes, mean, std).numpy()

    enc = UnetEncoder(chans=CHANS, num_pools=POOLS, normalize=True, padding=True, padding_size=11,
                      norm_groups=GROUPS)
    dec = UnetDecoder(out_chans=2 * C, chans=CHANS, num_pools=POOLS, normalize=True, padding=True,
                      norm_groups=GROUPS)
    # channels-last [re coils..., im coils...] like the reference's
    # complex_to_chan_dim (idslr_block.py:104-110)
    x_nhwc = jnp.asarray(np.concatenate([y[..., 0], y[..., 1]], axis=1).transpose(0, 2, 3, 1))
    enc_params = import_idslr_encoder_params(_sd(tenc), num_pools=POOLS)
    dec_params = import_idslr_decoder_params(_sd(tdec), num_pools=POOLS)
    stack_j, pads_j, mean_j, std_j = enc.apply({"params": enc_params}, x_nhwc)
    got = dec.apply({"params": dec_params}, stack_j, pads_j, mean_j, std_j)
    # back to [B, C, H, W, 2]
    got = np.asarray(got).transpose(0, 3, 1, 2)
    got = np.stack([got[:, :C], got[:, C:]], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_idslr_dc_matches_reference(ref):
    from mridc_tpu.models.multitask.blocks import KSpaceDC

    torch.manual_seed(1)
    tdc = ref["idslr_block"].DC()
    rng = np.random.default_rng(5)
    pred = _rand_rv(rng, (B, C, H, W))
    refk = _rand_rv(rng, (B, C, H, W))
    mask = (rng.random((B, 1, H, W, 1)) > 0.5).astype(np.float32)
    with torch.no_grad():
        want = torch.view_as_real(
            tdc(torch.from_numpy(pred), torch.from_numpy(refk), torch.from_numpy(mask))
        ).numpy()
    dc = KSpaceDC()
    got = dc.apply(
        {"params": {"dc_weight": jnp.ones((1,))}}, jnp.asarray(pred), jnp.asarray(refk), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def _compose_reference_idslr(ref, tenc, tdec_r, seg_module, y, mask, sens, num_iters, seg_head):
    """The reference IDSLR/IDSLRUNet forward loop (idslr.py:141-173,
    idslr_unet.py:150-180) composed from its blocks."""
    fft, utils = ref["fft"], ref["utils"]
    tdc = ref["idslr_block"].DC()
    yq = torch.from_numpy(y)
    mq = torch.from_numpy(mask)
    y_pred = yq.clone()
    with torch.no_grad():
        for _ in range(num_iters):
            init = fft.ifft2(y_pred, False, "backward", [-2, -1])
            output = tenc(init)
            stack, iscomplex, pad_sizes, mean, std = output
            dec_pred = tdec_r(list(stack), iscomplex, pad_sizes, mean, std) + init
            y_pred = tdc(fft.fft2(dec_pred, False, "backward", [-2, -1]), yq, mq)
        image = fft.ifft2(y_pred, False, "backward", [-2, -1])
        recon = utils.coil_combination(image, torch.from_numpy(sens), method="SENSE", dim=1)  # real-view
        if seg_head == "unet":
            b, c, h, w, _ = image.shape
            seg_in = image.permute(0, 4, 1, 2, 3).reshape(b, 2 * c, h, w)
            seg_in = torch.abs(torch.nn.functional.group_norm(seg_in, num_groups=GROUPS))
            seg = seg_module(seg_in)
        else:
            seg_in = [
                torch.abs(torch.nn.functional.group_norm(s, num_groups=GROUPS)) for s in stack
            ]
            seg = seg_module(seg_in, iscomplex=False, pad_sizes=pad_sizes)
        seg = torch.abs(seg)
        seg = seg / torch.max(seg)
    return recon.numpy(), seg.numpy()


@pytest.mark.parametrize("variant", ["IDSLR", "IDSLRUNET"])
def test_idslr_full_forward_matches_reference(ref, variant):
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import (
        import_idslr_decoder_params,
        import_idslr_encoder_params,
        import_unet_params,
    )

    torch.manual_seed(2)
    num_iters, classes = 2, 3
    tenc = ref["idslr_block"].UnetEncoder(chans=CHANS, num_pools=POOLS, in_chans=2 * C, norm_groups=GROUPS)
    tdec_r = ref["idslr_block"].UnetDecoder(chans=CHANS, num_pools=POOLS, out_chans=2 * C, norm_groups=GROUPS)
    if variant == "IDSLRUNET":
        seg_module = ref["unet_block"].Unet(
            in_chans=2 * C, out_chans=classes, chans=CHANS, num_pool_layers=POOLS, drop_prob=0.0
        )
    else:
        seg_module = ref["idslr_block"].UnetDecoder(
            chans=CHANS, num_pools=POOLS, out_chans=classes, norm_groups=GROUPS
        )
    y, sens, mask = _inputs(7)
    want_recon, want_seg = _compose_reference_idslr(
        ref, tenc, tdec_r, seg_module, y, mask, sens, num_iters, "unet" if variant == "IDSLRUNET" else "decoder"
    )

    model = build_model(
        {
            "model_name": variant,
            "num_iters": num_iters,
            "channels": CHANS,
            "num_pools": POOLS,
            "segmentation_module_output_channels": classes,
            "norm_groups": GROUPS,
            "fft_centered": False,
            "fft_normalization": "backward",
            "coil_combination_method": "SENSE",
        }
    )
    if variant == "IDSLRUNET":
        seg_tree = {"Unet_0": import_unet_params(_sd(seg_module), num_pools=POOLS)}
    else:
        seg_tree = {"UnetDecoder_1": import_idslr_decoder_params(_sd(seg_module), num_pools=POOLS)}
    params = {
        "UnetEncoder_0": import_idslr_encoder_params(_sd(tenc), num_pools=POOLS),
        "UnetDecoder_0": import_idslr_decoder_params(_sd(tdec_r), num_pools=POOLS),
        "KSpaceDC_0": {"dc_weight": np.ones((1,), np.float32)},
        **seg_tree,
    }
    out, seg = model.apply({"params": params}, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0]))
    got_recon = np.asarray(out.prediction)
    got_seg = np.asarray(seg).transpose(0, 3, 1, 2)  # NHWC -> NCHW
    np.testing.assert_allclose(got_recon, want_recon, rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(got_seg, want_seg, rtol=1e-3, atol=3e-4)


def test_segnet_matches_reference(ref):
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import (
        import_conv_nonlinear_params,
        import_idslr_decoder_params,
        import_idslr_encoder_params,
    )

    torch.manual_seed(4)
    casc, classes = 2, 3
    fft, utils = ref["fft"], ref["utils"]
    encs = [ref["idslr_block"].UnetEncoder(chans=CHANS, num_pools=POOLS, in_chans=2 * C,
                                           normalize=False, padding=False, norm_groups=GROUPS)
            for _ in range(casc)]
    rdecs = [ref["idslr_block"].UnetDecoder(chans=CHANS, num_pools=POOLS, out_chans=2 * C,
                                            normalize=False, padding=False, norm_groups=GROUPS)
             for _ in range(casc)]
    sdecs = [ref["idslr_block"].UnetDecoder(chans=CHANS, num_pools=POOLS, out_chans=classes,
                                            normalize=False, padding=False, norm_groups=GROUPS)
             for _ in range(casc)]
    final = ref["conv_layers"].ConvNonlinear(
        classes * casc, classes, conv_dim=2, kernel_size=3, dilation=1, bias=False, nonlinear="relu"
    )
    tdc = ref["idslr_block"].DC()

    y, sens, mask = _inputs(11)
    yq, mq = torch.from_numpy(y), torch.from_numpy(mask)
    # reference segnet.py:170-205 forward composed from its blocks
    with torch.no_grad():
        y_pred = yq.clone()
        segs = []
        for re_, rd_, sd_ in zip(encs, rdecs, sdecs):
            init = fft.ifft2(y_pred, False, "backward", [-2, -1])
            output = re_(init)
            stack, iscomplex, pad_sizes = output[0], output[1], output[2]
            seg_in = [torch.abs(torch.nn.functional.group_norm(s, num_groups=GROUPS)) for s in stack]
            segs.append(sd_(seg_in, iscomplex=False, pad_sizes=pad_sizes))
            dec_pred = rd_(*output)
            y_pred = tdc(fft.fft2(dec_pred, False, "backward", [-2, -1]), yq, mq)
        image = fft.ifft2(y_pred, False, "backward", [-2, -1])
        want_recon = utils.coil_combination(image, torch.from_numpy(sens), method="SENSE", dim=1).numpy()
        want_seg = final(torch.cat(segs, dim=1))
        want_seg = (want_seg / torch.max(want_seg)).numpy()

    model = build_model(
        {
            "model_name": "SEGNET",
            "num_cascades": casc,
            "channels": CHANS,
            "num_pools": POOLS,
            "segmentation_module_output_channels": classes,
            "norm_groups": GROUPS,
            "fft_centered": False,
            "fft_normalization": "backward",
            "coil_combination_method": "SENSE",
        }
    )
    params = {"KSpaceDC_0": {"dc_weight": np.ones((1,), np.float32)},
              "ConvNonlinear_0": import_conv_nonlinear_params(_sd(final))}
    for i in range(casc):
        params[f"UnetEncoder_{i}"] = import_idslr_encoder_params(_sd(encs[i]), num_pools=POOLS)
        params[f"UnetDecoder_{2 * i}"] = import_idslr_decoder_params(_sd(sdecs[i]), num_pools=POOLS)
        params[f"UnetDecoder_{2 * i + 1}"] = import_idslr_decoder_params(_sd(rdecs[i]), num_pools=POOLS)
    out, seg = model.apply({"params": params}, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0]))
    np.testing.assert_allclose(np.asarray(out.prediction), want_recon, rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(seg).transpose(0, 3, 1, 2), want_seg, rtol=1e-3, atol=3e-4)


def test_recseg_unet_matches_reference(ref):
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_unet_params

    torch.manual_seed(6)
    classes, chans, pools = 3, 8, 2
    recon_t = ref["unet_block"].Unet(in_chans=1, out_chans=1, chans=chans, num_pool_layers=pools, drop_prob=0.0)
    seg_t = ref["unet_block"].Unet(in_chans=1, out_chans=classes, chans=chans, num_pool_layers=pools, drop_prob=0.0)

    rng = np.random.default_rng(13)
    init_pred = _rand_rv(rng, (B, H, W))  # [B, H, W, 2]
    with torch.no_grad():
        # reference recseg_unet.py:105-130: 1-channel magnitude input
        x = torch.abs(torch.view_as_complex(torch.from_numpy(init_pred))).unsqueeze(1)
        pred_recon = recon_t(x)
        normed = torch.nn.functional.group_norm(pred_recon, num_groups=1)
        seg = torch.abs(seg_t(normed))
        want_seg = (seg / torch.max(seg)).numpy()
        want_recon = pred_recon.squeeze(1).numpy()

    model = build_model(
        {
            "model_name": "RECSEGUNET",
            "reconstruction_module_channels": chans,
            "reconstruction_module_pooling_layers": pools,
            "segmentation_module_channels": chans,
            "segmentation_module_pooling_layers": pools,
            "segmentation_module_output_channels": classes,
            "segmentation_module_input_channels": 1,
        }
    )
    params = {
        "Unet_0": import_unet_params(_sd(recon_t), num_pools=pools),
        "Unet_1": import_unet_params(_sd(seg_t), num_pools=pools),
    }
    y = _rand_rv(rng, (B, C, H, W))
    sens = _rand_rv(rng, (B, C, H, W))
    out, seg = model.apply(
        {"params": params}, jnp.asarray(y), jnp.asarray(sens), None, init_pred=jnp.asarray(init_pred)
    )
    got_recon = np.asarray(out.prediction)
    np.testing.assert_allclose(got_recon[..., 0], want_recon, rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(seg).transpose(0, 3, 1, 2), want_seg, rtol=1e-3, atol=3e-4)
