"""Golden parity for segmentation blocks vs the reference's actual torch
modules: AttentionUnet (attention_unet_base/attention_unet_block.py:67) and
the Lambda stack (lambda_unet_base/lambda_unet_block.py:11,134,214), with
imported weights (eval mode; BatchNorm running stats imported)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax.numpy as jnp

import reference_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return {
        "attention": reference_loader.load(
            "mridc.collections.segmentation.nn.attention_unet_base.attention_unet_block"
        ),
        "lam": reference_loader.load("mridc.collections.segmentation.nn.lambda_unet_base.lambda_unet_block"),
    }


def _sd(module):
    return {k: v.numpy() for k, v in module.state_dict().items()}


def _nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def _nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def test_attention_unet_matches_reference(ref):
    from mridc_tpu.nn.seg_blocks import AttentionUnet
    from mridc_tpu.utils.torch_import import import_attention_unet_params

    torch.manual_seed(7)
    tnet = ref["attention"].AttentionUnet(in_chans=2, out_chans=3, chans=8, num_pool_layers=2).eval()
    x = np.random.default_rng(8).standard_normal((2, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = AttentionUnet(out_chans=3, chans=8, num_pool_layers=2)
    params = import_attention_unet_params(_sd(tnet), chans=8, num_pools=2)
    got = net.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, rtol=2e-3, atol=2e-4)


def test_lambda_layer_matches_reference(ref):
    from mridc_tpu.nn.seg_blocks import LambdaLayer
    from mridc_tpu.utils.torch_import import import_lambda_layer_params

    torch.manual_seed(8)
    tl = ref["lam"].LambdaLayer(
        in_channels=6, out_channels=8, query_depth=5, intra_depth=3, receptive_kernel=3, heads=2
    ).eval()
    x = np.random.default_rng(9).standard_normal((2, 6, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()

    layer = LambdaLayer(out_channels=8, query_depth=5, intra_depth=3, receptive_kernel=3, heads=2)
    params = import_lambda_layer_params(_sd(tl))
    got = layer.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, rtol=1e-3, atol=1e-4)


def test_lambda_layer_temporal_matches_reference(ref):
    """temporal_kernel >= 3 branch (2.5D slice attention)."""
    from mridc_tpu.nn.seg_blocks import LambdaLayer
    from mridc_tpu.utils.torch_import import import_lambda_layer_params

    torch.manual_seed(9)
    tl = ref["lam"].LambdaLayer(
        in_channels=4, out_channels=8, query_depth=5, intra_depth=2,
        receptive_kernel=3, temporal_kernel=3, heads=2, num_slices=3,
    ).eval()
    x = np.random.default_rng(10).standard_normal((6, 4, 8, 8)).astype(np.float32)  # b = g*t = 2*3
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()

    layer = LambdaLayer(
        out_channels=8, query_depth=5, intra_depth=2, receptive_kernel=3,
        temporal_kernel=3, heads=2, num_slices=3,
    )
    params = import_lambda_layer_params(_sd(tl), temporal=True)
    got = layer.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, rtol=1e-3, atol=1e-4)


def test_lambda_unet_matches_reference(ref):
    from mridc_tpu.nn.seg_blocks import LambdaUnet
    from mridc_tpu.utils.torch_import import import_lambda_unet_params

    torch.manual_seed(10)
    tnet = ref["lam"].LambdaUNet(
        in_chans=2, out_chans=3, chans=32, num_pool_layers=2,
        query_depth=16, intra_depth=1, receptive_kernel=3, temporal_kernel=1,
    ).eval()
    x = np.random.default_rng(11).standard_normal((1, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = LambdaUnet(
        out_chans=3, chans=32, num_pool_layers=2,
        query_depth=16, intra_depth=1, receptive_kernel=3, temporal_kernel=1,
    )
    params = import_lambda_unet_params(_sd(tnet), num_pools=2)
    got = net.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, rtol=2e-3, atol=2e-4)


def test_vnet_matches_reference():
    from mridc_tpu.nn.seg_blocks import VNet
    from mridc_tpu.utils.torch_import import import_vnet_params

    vb = reference_loader.load("mridc.collections.segmentation.nn.vnet_base.vnet_block")
    torch.manual_seed(11)
    tnet = vb.VNet(in_chans=2, out_chans=3, act="elu", drop_prob=0.5).eval()
    x = np.random.default_rng(12).standard_normal((1, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = VNet(out_chans=3, act="elu", drop_prob=0.5)
    params = import_vnet_params({k: v.numpy() for k, v in tnet.state_dict().items()})
    got = net.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("res_block", [False, True])
def test_dynunet_matches_reference(res_block):
    from mridc_tpu.nn.seg_blocks import DynUNet
    from mridc_tpu.utils.torch_import import import_dynunet_params

    db = reference_loader.load("mridc.collections.segmentation.nn.dynunet_base.dynunet_block")
    torch.manual_seed(12)
    strides = [1, 2, 2, 2]
    tnet = db.DynUNet(
        spatial_dims=2, in_channels=2, out_channels=3,
        kernel_size=[3, 3, 3, 3], strides=strides, upsample_kernel_size=strides[1:],
        filters=[8, 16, 32, 64], res_block=res_block,
    ).eval()
    x = np.random.default_rng(13).standard_normal((1, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = DynUNet(out_chans=3, kernel_size=(3, 3, 3, 3), strides=(1, 2, 2, 2),
                  filters=(8, 16, 32, 64), res_block=res_block)
    params = import_dynunet_params(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, num_levels=4, res_block=res_block)
    got = net.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, rtol=2e-3, atol=2e-4)


def test_dynunet_deep_supervision_matches_reference():
    """Training-mode deep supervision: stacked [out, interpolated heads]
    (reference dynunet_block.py:313-322, MONAI nearest interpolate)."""
    from mridc_tpu.nn.seg_blocks import DynUNet
    from mridc_tpu.utils.torch_import import import_dynunet_params

    db = reference_loader.load("mridc.collections.segmentation.nn.dynunet_base.dynunet_block")
    torch.manual_seed(13)
    strides = [1, 2, 2, 2]
    tnet = db.DynUNet(
        spatial_dims=2, in_channels=2, out_channels=3,
        kernel_size=[3, 3, 3, 3], strides=strides, upsample_kernel_size=strides[1:],
        filters=[8, 16, 32, 64], deep_supervision=True, deep_supr_num=2,
    ).train()
    x = np.random.default_rng(14).standard_normal((1, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()  # [B, 3, C, H, W]

    net = DynUNet(out_chans=3, kernel_size=(3, 3, 3, 3), strides=(1, 2, 2, 2),
                  filters=(8, 16, 32, 64), deep_supervision=True, deep_supr_num=2)
    params = import_dynunet_params(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, num_levels=4, deep_supr_num=2)
    got = np.asarray(net.apply({"params": params}, _nhwc(x), train=True))  # [B, 3, H, W, C]
    np.testing.assert_allclose(np.moveaxis(got, -1, 2), want, rtol=2e-3, atol=2e-4)


def test_unetr_matches_reference():
    from mridc_tpu.nn.seg_blocks import UNETR
    from mridc_tpu.utils.torch_import import import_unetr_params

    ub = reference_loader.load("mridc.collections.segmentation.nn.unetr_base.unetr_block")
    torch.manual_seed(14)
    tnet = ub.UNETR(
        in_channels=2, out_channels=3, img_size=(32, 32), feature_size=4,
        hidden_size=24, mlp_dim=48, num_heads=3, spatial_dims=2,
    ).eval()
    x = np.random.default_rng(15).standard_normal((1, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = UNETR(out_chans=3, feature_size=4, hidden_size=24, mlp_dim=48, num_heads=3)
    params = import_unetr_params({k: v.numpy() for k, v in tnet.state_dict().items()})
    got = net.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, rtol=3e-3, atol=3e-4)


def test_unet3d_matches_reference():
    """Golden: 3D UNet vs reference unet3d_base/unet3d_block.py:72 with
    imported weights (in-plane pooling, InstanceNorm3d, reflect pad)."""
    import reference_loader

    from mridc_tpu.nn.seg_blocks import UNet3D
    from mridc_tpu.utils.torch_import import import_unet3d_params

    block = reference_loader.load("mridc.collections.segmentation.nn.unet3d_base.unet3d_block")
    torch.manual_seed(9)
    chans, pools, classes = 4, 2, 3
    tnet = block.UNet3D(in_chans=1, out_chans=classes, chans=chans, num_pool_layers=pools, drop_prob=0.0).eval()
    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, 1, 3, 17, 18)).astype(np.float32)  # [B, C, D, H, W] odd H/W
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = UNet3D(out_chans=classes, chans=chans, num_pool_layers=pools)
    params = import_unet3d_params({k: v.numpy() for k, v in tnet.state_dict().items()}, num_pools=pools)
    x_j = jnp.asarray(np.moveaxis(x, 1, -1))  # NCDHW -> NDHWC
    got = np.moveaxis(np.asarray(net.apply({"params": params}, x_j)), -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
