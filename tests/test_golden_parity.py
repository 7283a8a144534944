"""Golden-value parity against the ACTUAL reference implementation.

Loads the reference's own torch modules from /root/reference (leaf files only,
via reference_loader — no PTL/hydra needed), runs them on fixed inputs, and
checks our TPU-native graphs reproduce the numbers with converted weights.
This is stronger than the reimplemented-graph test in test_torch_parity.py:
any divergence in layer semantics, gate order, DC arithmetic, or FFT
conventions shows up here.

Reference: mridc/collections/reconstruction/nn/rim/rim_block.py (RIMBlock),
rim/rim_utils.py (log_likelihood_gradient), common/parts/fft.py (fft2/ifft2).
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import reference_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    mods = {}
    mods["fft"] = reference_loader.load("mridc.collections.common.parts.fft")
    mods["rim_utils"] = reference_loader.load("mridc.collections.reconstruction.nn.rim.rim_utils")
    mods["rim_block"] = reference_loader.load("mridc.collections.reconstruction.nn.rim.rim_block")
    return mods


def _inputs(b=1, c=3, h=16, w=16, seed=7):
    rng = np.random.default_rng(seed)
    y = rng.standard_normal((b, c, h, w, 2)).astype(np.float32) * 0.1
    sens = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
    sens /= np.sqrt((sens**2).sum(-1, keepdims=True).sum(1, keepdims=True)) + 1e-8
    mask = (rng.random((1, 1, h, w, 1)) > 0.4).astype(np.float32)
    mask[..., :, w // 2 - 2 : w // 2 + 2, :] = 1.0
    y = y * mask
    return y, sens, mask


def test_fft2_matches_reference(ref):
    """Our fft2 (real-view) vs reference common/parts/fft.py:13 on the same data."""
    from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

    y, _, _ = _inputs(h=16, w=16)
    for centered in (True, False):
        for norm in ("ortho", "backward"):
            want = ref["fft"].fft2(
                torch.from_numpy(y), centered=centered, normalization=norm, spatial_dims=[-2, -1]
            ).numpy()
            got = np.asarray(fft2_rv(jnp.asarray(y), centered, norm, (-2, -1)))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
            want_i = ref["fft"].ifft2(
                torch.from_numpy(y), centered=centered, normalization=norm, spatial_dims=[-2, -1]
            ).numpy()
            got_i = np.asarray(ifft2_rv(jnp.asarray(y), centered, norm, (-2, -1)))
            np.testing.assert_allclose(got_i, want_i, rtol=1e-4, atol=1e-5)


def test_log_likelihood_gradient_matches_reference(ref):
    """Our LLG vs reference rim/rim_utils.py:11 (DC gradient, 4-channel output)."""
    from mridc_tpu.nn.dc import log_likelihood_gradient

    y, sens, mask = _inputs()
    eta = np.random.default_rng(3).standard_normal((1, 16, 16, 2)).astype(np.float32)
    want = ref["rim_utils"].log_likelihood_gradient(
        torch.from_numpy(eta),
        torch.from_numpy(y),
        torch.from_numpy(sens),
        torch.from_numpy(mask),
        sigma=1.0,
        fft_centered=True,
        fft_normalization="ortho",
        spatial_dims=[-2, -1],
        coil_dim=1,
    ).numpy()  # [B, 4, H, W]
    got = np.asarray(
        log_likelihood_gradient(
            jnp.asarray(eta), jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0]),
            sigma=1.0, fft_centered=True, fft_normalization="ortho",
            spatial_dims=(-2, -1), coil_dim=1,
        )
    )  # ours: [B, H, W, 4] NHWC
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("time_steps", [8, 5])
def test_cirim_block_matches_reference_weights(ref, time_steps):
    """End-to-end: the reference's real RIMBlock graph vs our scan-based CIRIM
    with its weights imported (utils/torch_import.py mapping). T=5 pins that
    from_config honors non-multiple-of-8 step counts exactly."""
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_cirim_params

    torch.manual_seed(0)
    blk = ref["rim_block"].RIMBlock(
        recurrent_layer="IndRNN",
        conv_filters=[8, 8, 2], conv_kernels=[5, 3, 3], conv_dilations=[1, 2, 1],
        conv_bias=[True, True, False],
        recurrent_filters=[8, 8, 0], recurrent_kernels=[1, 1, 0],
        recurrent_dilations=[1, 1, 0], recurrent_bias=[True, True, False],
        depth=2, time_steps=time_steps, no_dc=True,
        fft_centered=True, fft_normalization="ortho", spatial_dims=[-2, -1], coil_dim=1,
    ).eval()

    y, sens, mask = _inputs()
    with torch.no_grad():
        preds, _ = blk(
            torch.from_numpy(y),
            torch.from_numpy(y),
            torch.from_numpy(sens),
            torch.from_numpy(mask),
            prediction=None,
            hx=None,
            sigma=1.0,
            keep_prediction=False,
        )
    want = preds[-1].numpy()  # [B, H, W, 2] real view, final time step

    state = {f"cirim.0.{k}": v.numpy() for k, v in blk.state_dict().items()}
    params = import_cirim_params(state, num_cascades=1)
    model = build_model(
        {
            "model_name": "CIRIM", "num_cascades": 1, "time_steps": time_steps,
            "conv_filters": [8, 8, 2], "recurrent_filters": [8, 8, 0],
            "fft_centered": True, "fft_normalization": "ortho",
        }
    )
    assert model.time_steps == time_steps
    out = model.apply(
        {"params": params}, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0])
    )
    got = np.asarray(out.prediction)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("kind", ["GRU", "MGU"])
def test_rnn_cells_match_reference(ref, kind):
    """Gate order + update equations vs reference rim/rnn_cells.py
    (ConvGRUCell :115, ConvMGUCell :280)."""
    from mridc_tpu.nn.rnn_cells import make_cell
    from mridc_tpu.utils.torch_import import oihw_to_hwio

    rc = reference_loader.load("mridc.collections.reconstruction.nn.rim.rnn_cells")
    torch.manual_seed(1)
    tcell = getattr(rc, f"Conv{kind}Cell")(4, 8, conv_dim=2, kernel_size=1, dilation=1, bias=True)
    x = np.random.default_rng(2).standard_normal((1, 4, 8, 8)).astype(np.float32)
    h = np.random.default_rng(3).standard_normal((1, 8, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tcell(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    sd = {k: v.numpy() for k, v in tcell.state_dict().items()}
    params = {
        "Conv_0": {"kernel": oihw_to_hwio(sd["ih.weight"]), "bias": sd["ih.bias"]},
        "Conv_1": {"kernel": oihw_to_hwio(sd["hh.weight"])},
    }
    cell = make_cell(kind, 8, 1, 1, True)
    got = cell.apply(
        {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(np.moveaxis(h, 1, -1))
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, rtol=1e-5, atol=1e-6)


def test_normunet_matches_reference(ref):
    """Full NormUnet graph (norm -> pad -> unet -> unpad -> unnorm) vs
    reference unet_base/unet_block.py:11 with imported weights."""
    from mridc_tpu.nn.unet import NormUnet
    from mridc_tpu.utils.torch_import import import_normunet_params

    ub = reference_loader.load("mridc.collections.reconstruction.nn.unet_base.unet_block")
    torch.manual_seed(5)
    tnet = ub.NormUnet(chans=4, num_pools=2, in_chans=2, out_chans=2).eval()
    x = np.random.default_rng(11).standard_normal((1, 12, 20, 2)).astype(np.float32)
    with torch.no_grad():  # reference wants [b, coils, h, w, 2]
        want = tnet(torch.from_numpy(x[:, None])).numpy()[:, 0]

    params = import_normunet_params(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, chans=4, num_pools=2
    )
    net = NormUnet(chans=4, num_pools=2)
    got = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_varnet_matches_reference(ref):
    """Full E2E VarNet (2 cascades of soft-DC + NormUnet, final RSS/SENSE
    combine) vs the reference's real vn_block graph with imported weights
    (reference nn/vn.py:19, varnet/vn_block.py:11)."""
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_varnet_params

    ub = reference_loader.load("mridc.collections.reconstruction.nn.unet_base.unet_block")
    vb = reference_loader.load("mridc.collections.reconstruction.nn.varnet.vn_block")
    futils = reference_loader.load("mridc.collections.common.parts.utils")

    torch.manual_seed(9)
    cascades = torch.nn.ModuleList(
        [
            vb.VarNetBlock(
                ub.NormUnet(chans=4, num_pools=2, in_chans=2, out_chans=2),
                fft_centered=True, fft_normalization="ortho",
                spatial_dims=[-2, -1], coil_dim=1, no_dc=False,
            )
            for _ in range(2)
        ]
    ).eval()

    y, sens, mask = _inputs()
    ty, tsens, tmask = map(torch.from_numpy, (y, sens, mask))
    with torch.no_grad():
        pred = ty.clone()
        for cascade in cascades:
            pred = cascade(pred, ty, tsens, tmask)
        image = ref["fft"].ifft2(pred, centered=True, normalization="ortho", spatial_dims=[-2, -1])
        want = futils.complex_mul(image, futils.complex_conj(tsens)).sum(1).numpy()

    state = {f"cascades.{i}.{k}": v.numpy() for i, c in enumerate(cascades)
             for k, v in c.state_dict().items()}
    params = import_varnet_params(state, num_cascades=2, chans=4, num_pools=2)
    model = build_model(
        {"model_name": "VN", "num_cascades": 2, "channels": 4, "pooling_layers": 2,
         "fft_centered": True, "fft_normalization": "ortho", "coil_combination_method": "SENSE"}
    )
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0])).prediction
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_noise_prewhitening_matches_reference(ref):
    """NPW real-view covariance + Cholesky whitening vs reference
    common/parts/transforms.py:32 (exact)."""
    from mridc_tpu.data.transforms import NoisePreWhitening

    rt = reference_loader.load("mridc.collections.common.parts.transforms")
    rng = np.random.default_rng(0)
    k = (rng.standard_normal((6, 24, 24)) + 1j * rng.standard_normal((6, 24, 24))).astype(np.complex64)
    ref_npw = rt.NoisePreWhitening(find_patch_size=False, patch_size=[0, 6, 0, 6], scale_factor=1.3)
    want = torch.view_as_complex(ref_npw(torch.view_as_real(torch.from_numpy(k)))).numpy()
    got = NoisePreWhitening(find_patch_size=False, patch_size=[0, 6, 0, 6], scale_factor=1.3)(k)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # auto patch search agrees too
    ref_auto = rt.NoisePreWhitening(find_patch_size=True, patch_size=[0, 6, 0, 6])
    want2 = torch.view_as_complex(ref_auto(torch.view_as_real(torch.from_numpy(k)))).numpy()
    got2 = NoisePreWhitening(find_patch_size=True)(k)
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-5)


def test_gcc_matches_reference(ref):
    """GCC coil compression vs reference common/parts/transforms.py:214.
    Virtual coils are defined up to a per-coil phase (SVD convention), so
    magnitudes and the RSS image must match; phases may rotate."""
    from mridc_tpu.data.transforms import GeometricDecompositionCoilCompression as GCC

    rt = reference_loader.load("mridc.collections.common.parts.transforms")
    rng = np.random.default_rng(0)
    k = (rng.standard_normal((6, 24, 24)) + 1j * rng.standard_normal((6, 24, 24))).astype(np.complex64)
    ref_gcc = rt.GeometricDecompositionCoilCompression(virtual_coils=4, calib_lines=12, align_data=True)
    want = torch.view_as_complex(ref_gcc(torch.view_as_real(torch.from_numpy(k)))).numpy()
    got = GCC(virtual_coils=4, calib_lines=12, align_data=True)(k)
    assert got.shape == want.shape == (4, 24, 24)
    np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=1e-3, atol=1e-4)
    # RSS image (the downstream-visible quantity) matches exactly
    img_got = np.fft.ifft2(got)
    img_want = np.fft.ifft2(want)
    np.testing.assert_allclose(
        np.sqrt((np.abs(img_got) ** 2).sum(0)), np.sqrt((np.abs(img_want) ** 2).sum(0)),
        rtol=1e-3, atol=1e-5,
    )


def test_mask_generators_match_reference(ref):
    """Mask generators vs reference reconstruction/data/subsample.py.
    random1d/equispaced1d/equispaced2d are bit-identical under the same seed;
    gaussian2d is bit-identical when the global np.random state is aligned
    (the reference draws gaussian/poisson samples from the GLOBAL RNG,
    subsample.py Gaussian*.gaussian_coordinates — ours uses the seeded
    instance RNG with the same call sequence). Poisson2D bit-parity is
    covered in test_gaussian2d_poisson2d_bitwise below vs the v2 module."""
    sub = reference_loader.load("mridc.collections.reconstruction.data.subsample")
    from mridc_tpu.data.subsample import create_masker

    shape = (1, 64, 64, 2)
    for mtype in ("random1d", "equispaced1d", "equispaced2d"):
        rm, racc = sub.create_mask_for_mask_type(mtype, [0.08], [4])(list(shape), seed=42)
        om, oacc = create_masker(mtype, [0.08], [4])(np.array(shape), 42)
        assert np.array_equal(
            np.asarray(rm).squeeze().astype(bool), np.asarray(om).squeeze().astype(bool)
        ), mtype
        assert float(racc) == float(oacc)

    np.random.seed(7)
    rm = np.asarray(sub.create_mask_for_mask_type("gaussian2d", [0.7], [4])(list(shape), seed=7)[0])
    om = np.asarray(create_masker("gaussian2d", [0.7], [4])(np.array(shape), 7)[0])
    assert np.array_equal(rm.squeeze().astype(bool), om.squeeze().astype(bool))


@pytest.mark.parametrize(
    "shape,acc,cf,hsp",
    [((1, 64, 64, 2), 4, 0.7, 0.0), ((1, 64, 48, 2), 8, 0.7, 0.0), ((1, 96, 64, 2), 4, 1.4, 0.1)],
)
def test_gaussian2d_poisson2d_bitwise(ref, shape, acc, cf, hsp):
    """Gaussian2D AND Poisson2D bit-identical vs the reference's v2 module
    (common/data/subsample.py:493 Gaussian2D, :621 Poisson2D) under aligned
    RNG streams. The reference draws its 2D samples from the GLOBAL
    ``np.random`` with no temp_seed (its numba-jitted poisson body is run
    as pure Python here — reference_loader stubs ``nb.jit`` — which makes
    the draw sequence observable); ours draws the identical sequence from
    the fname-seeded instance RNG under ``temp_seed``, a strict
    reproducibility improvement with bitwise-equal output."""
    sub = reference_loader.load("mridc.collections.common.data.subsample")
    from mridc_tpu.data.subsample import create_masker

    for seed in (3, 99):
        np.random.seed(seed)
        rm, racc = sub.create_masker("gaussian2d", [cf], [acc])(
            list(shape), seed=seed, half_scan_percentage=hsp
        )
        om, oacc = create_masker("gaussian2d", [cf], [acc])(
            np.array(shape), seed, half_scan_percentage=hsp
        )
        assert np.array_equal(
            np.asarray(rm).squeeze().astype(bool), np.asarray(om).squeeze().astype(bool)
        ), ("gaussian2d", seed)
        assert float(racc) == float(oacc)

        np.random.seed(seed)
        rm, racc = sub.create_masker("poisson2d", [0.08], [acc])(
            list(shape), seed=seed, half_scan_percentage=hsp
        )
        om, oacc = create_masker("poisson2d", [0.08], [acc])(
            np.array(shape), seed, half_scan_percentage=hsp
        )
        assert np.array_equal(
            np.asarray(rm).squeeze().astype(bool), np.asarray(om).squeeze().astype(bool)
        ), ("poisson2d", seed)
        assert float(racc) == float(oacc)


def test_gaussian1d_reference_degeneracy_not_replicated(ref):
    """INTENTIONAL deviation: the reference's Gaussian1DMaskFunc returns
    mask[0] of a row-sampled H x W grid after ifftshift (subsample.py
    Gaussian1DMaskFunc.__call__), which is a CONSTANT vector — every mask is
    all-ones or all-zeros. Ours implements the documented behavior (gaussian
    column density + fully-sampled center strip)."""
    sub = reference_loader.load("mridc.collections.reconstruction.data.subsample")
    from mridc_tpu.data.subsample import create_masker

    shape = (1, 64, 64, 2)
    means = []
    for s in range(8):
        np.random.seed(s)
        m, _ = sub.create_mask_for_mask_type("gaussian1d", [0.7], [4])(list(shape), seed=s)
        means.append(float(np.asarray(m).mean()))
    assert all(m in (0.0, 1.0) for m in means), "reference degeneracy disappeared — revisit parity"

    om = np.asarray(create_masker("gaussian1d", [0.7], [4])(np.array(shape), 3)[0]).squeeze()
    frac = om.astype(bool).mean()
    assert 0.05 < frac < 0.6, "our gaussian1d should be a genuine subsampling mask"


def test_ssim_loss_matches_reference(ref):
    """SSIMLoss (7x7 uniform window, 1-SSIM) vs reference common/losses/ssim.py:11."""
    from mridc_tpu.losses.ssim import SSIMLoss

    sl = reference_loader.load("mridc.collections.common.losses.ssim")
    rng = np.random.default_rng(0)
    t = rng.random((2, 32, 32)).astype(np.float32)
    p = (t + 0.1 * rng.standard_normal((2, 32, 32))).astype(np.float32)
    dr = np.array([1.0, 1.0], np.float32)
    want = float(
        sl.SSIMLoss()(torch.from_numpy(t).unsqueeze(1), torch.from_numpy(p).unsqueeze(1), torch.from_numpy(dr))
    )
    got = float(SSIMLoss()(jnp.asarray(t), jnp.asarray(p), jnp.asarray(dr)))
    assert abs(want - got) < 1e-5, (want, got)


@pytest.mark.parametrize("mask_type", ["Gaussian", "Uniform"])
def test_ssdu_split_matches_reference(ref, mask_type):
    """SSDU train/loss mask split vs reference common/parts/transforms.py:953.
    Gaussian selection is bit-identical with the RNG state aligned (the
    reference samples from the global np.random; ours from the seeded instance
    RNG). Uniform selection uses torch.multinomial in the reference (a
    different RNG stream), so equality is structural: identical split sizes
    and a valid train/loss partition."""
    from mridc_tpu.data.transforms import SSDU

    rt = reference_loader.load("mridc.collections.common.parts.transforms")
    rng = np.random.default_rng(5)
    mask2d = (rng.random((32, 32)) < 0.3).astype(np.float32)
    mask2d[14:18, 14:18] = 1.0  # ACS region
    ref_ssdu = rt.SSDU(mask_type=mask_type, rho=0.4, acs_block_size=(4, 4),
                       gaussian_std_scaling_factor=4.0, export_and_reuse_masks=False)
    np.random.seed(11)
    torch.manual_seed(11)
    tm, lm = ref_ssdu.forward(torch.from_numpy(mask2d), "f")
    ours = SSDU(mask_type=mask_type, rho=0.4, acs_block_size=(4, 4),
                gaussian_std_scaling_factor=4.0, rng=np.random.RandomState(11))
    otm, olm = ours(mask2d, "f")
    rtm = np.asarray(tm).squeeze().astype(bool)
    rlm = np.asarray(lm).squeeze().astype(bool)
    otm = np.asarray(otm).astype(bool)
    olm = np.asarray(olm).astype(bool)
    if mask_type == "Gaussian":
        assert np.array_equal(rtm, otm)
        assert np.array_equal(rlm, olm)
    else:
        assert rtm.sum() == otm.sum() and rlm.sum() == olm.sum()
    # both sides: train OR loss reproduces the original sampling; ACS in train
    assert np.array_equal(otm | olm, mask2d.astype(bool))
    assert np.array_equal(rtm | rlm, mask2d.astype(bool))
    assert otm[14:18, 14:18].all() and rtm[14:18, 14:18].all()


def test_ccnn_matches_reference(ref):
    """E2E CascadeNet (2 cascades of soft-DC + conv stack) vs the reference's
    real CascadeNetBlock graph with imported weights (reference nn/ccnn.py:19,
    cascadenet/ccnn_block.py:11, conv/conv2d.py)."""
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_ccnn_params

    cb = reference_loader.load("mridc.collections.reconstruction.nn.cascadenet.ccnn_block")
    cv = reference_loader.load("mridc.collections.reconstruction.nn.conv.conv2d")
    futils = reference_loader.load("mridc.collections.common.parts.utils")

    torch.manual_seed(13)
    cascades = torch.nn.ModuleList(
        [
            cb.CascadeNetBlock(
                cv.Conv2d(in_channels=2, out_channels=2, hidden_channels=8, n_convs=3),
                fft_centered=True, fft_normalization="ortho",
                spatial_dims=[-2, -1], coil_dim=1, no_dc=False,
            )
            for _ in range(2)
        ]
    ).eval()

    y, sens, mask = _inputs()
    ty, tsens, tmask = map(torch.from_numpy, (y, sens, mask))
    with torch.no_grad():
        pred = ty.clone()
        for cascade in cascades:
            pred = cascade(pred, ty, tsens, tmask)
        image = ref["fft"].ifft2(pred, centered=True, normalization="ortho", spatial_dims=[-2, -1])
        want = futils.complex_mul(image, futils.complex_conj(tsens)).sum(1).numpy()

    state = {f"cascades.{i}.{k}": v.numpy() for i, c in enumerate(cascades)
             for k, v in c.state_dict().items()}
    params = import_ccnn_params(state, num_cascades=2, n_convs=3)
    model = build_model(
        {"model_name": "CascadeNet", "num_cascades": 2, "hidden_channels": 8, "n_convs": 3,
         "fft_centered": True, "fft_normalization": "ortho", "coil_combination_method": "SENSE"}
    )
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0])).prediction
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_crnn_matches_reference(ref):
    """CRNN recurrent block (shared weights over iterations, residual conv
    stack, soft DC) vs reference convrecnet/crnn_block.py:33 with imported
    weights; our version is the same recurrence as an `nn.scan`."""
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_crnn_params

    rb = reference_loader.load("mridc.collections.reconstruction.nn.convrecnet.crnn_block")
    cv = reference_loader.load("mridc.collections.reconstruction.nn.conv.conv2d")
    futils = reference_loader.load("mridc.collections.common.parts.utils")

    torch.manual_seed(21)
    blk = rb.RecurrentConvolutionalNetBlock(
        cv.Conv2d(in_channels=2, out_channels=2, hidden_channels=8, n_convs=3),
        num_iterations=4, fft_centered=True, fft_normalization="ortho",
        spatial_dims=[-2, -1], coil_dim=1, no_dc=False,
    ).eval()

    y, sens, mask = _inputs()
    with torch.no_grad():
        preds = blk(torch.from_numpy(y), torch.from_numpy(sens), torch.from_numpy(mask))
        image = ref["fft"].ifft2(preds[-1], centered=True, normalization="ortho", spatial_dims=[-2, -1])
        want = futils.complex_mul(image, futils.complex_conj(torch.from_numpy(sens))).sum(1).numpy()

    params = import_crnn_params({k: v.numpy() for k, v in blk.state_dict().items()}, n_convs=3)
    model = build_model(
        {"model_name": "CRNNet", "num_iterations": 4, "hidden_channels": 8, "n_convs": 3,
         "fft_centered": True, "fft_normalization": "ortho", "coil_combination_method": "SENSE"}
    )
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0])).prediction
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_physics_utils_match_reference(ref):
    """Complex algebra / coil combination / crops vs reference
    common/parts/utils.py (complex_mul :96, rss :194, rss_complex :212,
    sense :230, center_crop :413, complex_center_crop :438,
    batched_mask_center :379). Ours: cplx ops take real views (device layout),
    ops.complex takes native complex (host layout) — both checked."""
    import mridc_tpu.ops.complex as cpx
    import mridc_tpu.ops.cplx as cx
    from mridc_tpu.ops.masking import batched_mask_center, center_crop

    futils = reference_loader.load("mridc.collections.common.parts.utils")
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 4, 16, 16, 2)).astype(np.float32)
    b = rng.standard_normal((2, 4, 16, 16, 2)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ac = a[..., 0] + 1j * a[..., 1]
    bc = b[..., 0] + 1j * b[..., 1]

    # real-view ops (device layout)
    np.testing.assert_allclose(
        np.asarray(cx.cmul(jnp.asarray(a), jnp.asarray(b))), futils.complex_mul(ta, tb).numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cx.cconj(jnp.asarray(a))), futils.complex_conj(ta).numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cx.cabs(jnp.asarray(a))), futils.complex_abs(ta).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cx.crss(jnp.asarray(a), 1)), futils.rss_complex(ta, dim=1).numpy(), rtol=1e-5)

    # native-complex ops (host layout)
    np.testing.assert_allclose(
        np.asarray(cpx.rss(jnp.asarray(ac), 1)), futils.rss_complex(ta, dim=1).numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cpx.sense(jnp.asarray(ac), jnp.asarray(bc), 1)),
        futils.tensor_to_complex_np(futils.sense(ta, tb, dim=1)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(center_crop(jnp.asarray(a[..., 0]), (10, 12))),
        futils.center_crop(ta[..., 0], (10, 12)).numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(center_crop(jnp.asarray(ac), (10, 12))),
        futils.tensor_to_complex_np(futils.complex_center_crop(ta, (10, 12))), rtol=1e-6)

    m = np.ones((2, 1, 16, 16, 1), np.float32)
    tm = futils.batched_mask_center(torch.from_numpy(m), torch.tensor([4, 5]), torch.tensor([12, 11]))
    om = batched_mask_center(jnp.asarray(m), jnp.asarray([4, 5]), jnp.asarray([12, 11]))
    np.testing.assert_allclose(np.asarray(om), tm.numpy(), rtol=1e-6)


def test_rvn_block_matches_reference(ref):
    """RecurrentVarNet refinement block (learned-rate k-space DC + multi-layer
    Conv2dGRU regularizer) vs reference recurrentvarnet.py:100 + conv2gru.py:13
    with imported weights."""
    from mridc_tpu.models.recon.rvn import _RVNBlock
    from mridc_tpu.utils.torch_import import oihw_to_hwio

    rv = reference_loader.load("mridc.collections.reconstruction.nn.recurrentvarnet.recurrentvarnet")

    torch.manual_seed(17)
    L = 4
    blk = rv.RecurrentVarNetBlock(in_channels=2, hidden_channels=8, fft_centered=True,
                                  fft_normalization="ortho", spatial_dims=[-2, -1], coil_dim=1).eval()
    y, sens, mask = _inputs()
    with torch.no_grad():
        want_k, want_h = blk(torch.from_numpy(y), torch.from_numpy(y), torch.from_numpy(mask),
                             torch.from_numpy(sens), None)

    sd = {k: v.numpy() for k, v in blk.state_dict().items()}
    gru = {}
    for i in range(L):
        gru[f"Conv_{4 * i}"] = {"kernel": oihw_to_hwio(sd[f"regularizer.conv_blocks.{i}.1.weight"]),
                                "bias": sd[f"regularizer.conv_blocks.{i}.1.bias"]}
        gru[f"Conv_{4 * i + 1}"] = {"kernel": oihw_to_hwio(sd[f"regularizer.update_gates.{i}.0.weight"]),
                                    "bias": sd[f"regularizer.update_gates.{i}.0.bias"]}
        gru[f"Conv_{4 * i + 2}"] = {"kernel": oihw_to_hwio(sd[f"regularizer.reset_gates.{i}.0.weight"]),
                                    "bias": sd[f"regularizer.reset_gates.{i}.0.bias"]}
        gru[f"Conv_{4 * i + 3}"] = {"kernel": oihw_to_hwio(sd[f"regularizer.out_gates.{i}.0.weight"]),
                                    "bias": sd[f"regularizer.out_gates.{i}.0.bias"]}
    gru[f"Conv_{4 * L}"] = {"kernel": oihw_to_hwio(sd[f"regularizer.conv_blocks.{L}.1.weight"]),
                            "bias": sd[f"regularizer.conv_blocks.{L}.1.bias"]}
    params = {"learning_rate": sd["learning_rate"], "Conv2dGRU_0": gru}

    ours = _RVNBlock(in_channels=2, hidden_channels=8, num_layers=L,
                     fft_centered=True, fft_normalization="ortho")
    got_k, got_h = ours.apply({"params": params}, jnp.asarray(y), jnp.asarray(y),
                              jnp.asarray(mask[..., 0]), jnp.asarray(sens), None)
    np.testing.assert_allclose(np.asarray(got_k), want_k.numpy(), rtol=2e-3, atol=2e-4)
    # hidden state layout: ours [B, H, W, C, L] vs reference [B, C, H, W, L]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got_h), 3, 1), want_h.numpy(), rtol=2e-3, atol=2e-4)


def test_signal_forward_model_matches_reference(ref):
    """MEGRE signal model S(TE) vs the reference's SignalForwardModel
    (quantitative/nn/base.py:2015). The class is self-contained pure torch, so
    it is extracted by AST from the (PTL-heavy) module and exec'd in isolation
    — still the reference's own code."""
    import ast
    from typing import Any, Dict, List, Optional, Tuple, Union

    from mridc_tpu.models.quantitative.signal_model import megre_signal

    src = open("/root/reference/mridc/collections/quantitative/nn/base.py").read()
    cls = [n for n in ast.parse(src).body
           if isinstance(n, ast.ClassDef) and n.name == "SignalForwardModel"][0]
    ns = {"torch": torch, "Union": Union, "Optional": Optional, "List": List,
          "Tuple": Tuple, "Any": Any, "Dict": Dict}
    exec(compile(ast.get_source_segment(src, cls), "ref_signal_model", "exec"), ns)

    rng = np.random.default_rng(0)
    r2 = rng.random((1, 8, 8)).astype(np.float32) * 100
    s0 = rng.random((1, 8, 8)).astype(np.float32)
    b0 = rng.random((1, 8, 8)).astype(np.float32) * 50
    phi = rng.random((1, 8, 8)).astype(np.float32)
    tes = [3.0, 11.5, 20.0, 28.5]
    with torch.no_grad():
        want = ns["SignalForwardModel"](sequence="MEGRE")(
            *(torch.from_numpy(x) for x in (r2, s0, b0, phi)), TEs=tes
        ).numpy()
    got = np.asarray(megre_signal(*(jnp.asarray(x) for x in (r2, s0, b0, phi)), tes))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_didn_matches_reference(ref):
    """DIDN denoiser (KIKINet/XPDNet backbone: down-up blocks, subpixel
    upsampling, shared recon block) vs reference didn/didn.py:242 with
    imported weights."""
    from mridc_tpu.nn.didn import DIDN
    from mridc_tpu.utils.torch_import import import_didn_params

    dd = reference_loader.load("mridc.collections.reconstruction.nn.didn.didn")
    torch.manual_seed(29)
    tnet = dd.DIDN(in_channels=2, out_channels=2, hidden_channels=16,
                   num_dubs=2, num_convs_recon=3).eval()
    x = np.random.default_rng(31).standard_normal((1, 2, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    params = import_didn_params({k: v.numpy() for k, v in tnet.state_dict().items()},
                                num_dubs=2, num_convs_recon=3)
    net = DIDN(out_channels=2, hidden_channels=16, num_dubs=2, num_convs_recon=3)
    got = np.asarray(net.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, rtol=1e-3, atol=1e-4)


def test_mwcnn_matches_reference(ref):
    """MWCNN (XPDNet image backbone: DWT/IWT multi-scale conv net) vs
    reference mwcnn/mwcnn.py with imported weights; DWT/IWT themselves are
    bit-exact (checked first)."""
    from mridc_tpu.nn.mwcnn import MWCNN, dwt2, iwt2
    from mridc_tpu.utils.torch_import import oihw_to_hwio

    mw = reference_loader.load("mridc.collections.reconstruction.nn.mwcnn.mwcnn")
    x4 = np.random.default_rng(0).standard_normal((1, 4, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(dwt2(jnp.asarray(np.moveaxis(x4, 1, -1)))), -1, 1),
        mw.DWT()(torch.from_numpy(x4)).numpy(), rtol=1e-6)
    x16 = np.random.default_rng(1).standard_normal((1, 16, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(iwt2(jnp.asarray(np.moveaxis(x16, 1, -1)))), -1, 1),
        mw.IWT()(torch.from_numpy(x16)).numpy(), rtol=1e-6)

    torch.manual_seed(33)
    tnet = mw.MWCNN(input_channels=2, first_conv_hidden_channels=8, num_scales=2,
                    bias=True, batchnorm=False).eval()
    x = np.random.default_rng(2).standard_normal((1, 2, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x), res=False).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}

    def cb(prefix):
        return {"Conv_0": {"kernel": oihw_to_hwio(sd[prefix + ".net.0.weight"]),
                           "bias": sd[prefix + ".net.0.bias"]}}

    def dil(prefix):
        return {"Conv_0": {"kernel": oihw_to_hwio(sd[prefix + ".net.0.weight"]),
                           "bias": sd[prefix + ".net.0.bias"]},
                "Conv_1": {"kernel": oihw_to_hwio(sd[prefix + ".net.2.weight"]),
                           "bias": sd[prefix + ".net.2.bias"]}}

    params = {
        "_CB_0": cb("down.0.convblock0"),
        "_DilCB_0": dil("down.0.dilconvblock0"),
        "_CB_1": cb("down.1.convblock1"),
        "_DilCB_1": dil("down.1.dilconvblock1"),
        "_DilCB_2": dil("up.0.invdilconvblock-1"),
        "_CB_2": cb("up.0.invconvblock-1"),
        "_DilCB_3": dil("up.1.invdilconvblock0"),
        "Conv_0": {"kernel": oihw_to_hwio(sd["up.1.invconvblock0.net.0.weight"]),
                   "bias": sd["up.1.invconvblock0.net.0.bias"]},
    }
    net = MWCNN(input_channels=2, first_conv_hidden_channels=8, num_scales=2)
    got = np.asarray(net.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, rtol=1e-3, atol=1e-4)


def test_multidomain_unet_matches_reference(ref):
    """MultiDomainUnet2d (dual image/k-space convs at every level) vs reference
    multidomain/multidomain.py:336 with imported weights."""
    from mridc_tpu.nn.multidomain import MultiDomainUnet2d
    from mridc_tpu.utils.torch_import import iohw_to_hwio_flipped, oihw_to_hwio

    md = reference_loader.load("mridc.collections.reconstruction.nn.multidomain.multidomain")
    torch.manual_seed(41)
    tnet = md.MultiDomainUnet2d(4, 4, 8, 2, 0.0, fft_centered=True, fft_normalization="ortho",
                                spatial_dims=[-2, -1], coil_dim=1).eval()
    x = np.random.default_rng(5).standard_normal((1, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}

    def mdc(prefix):
        return {"Conv_0": {"kernel": oihw_to_hwio(sd[prefix + ".image_conv.weight"])},
                "Conv_1": {"kernel": oihw_to_hwio(sd[prefix + ".kspace_conv.weight"])}}

    def block(prefix):
        return {"MultiDomainConv_0": mdc(prefix + ".layers.0"),
                "MultiDomainConv_1": mdc(prefix + ".layers.4")}

    params = {
        "MultiDomainConvBlock_0": block("down_sample_layers.0"),
        "MultiDomainConvBlock_1": block("down_sample_layers.1"),
        "MultiDomainConvBlock_2": block("conv"),
        "MultiDomainConv_0": {
            "ConvTranspose_0": {"kernel": iohw_to_hwio_flipped(sd["up_transpose_conv.0.layers.0.image_conv.weight"])},
            "ConvTranspose_1": {"kernel": iohw_to_hwio_flipped(sd["up_transpose_conv.0.layers.0.kspace_conv.weight"])},
        },
        "MultiDomainConvBlock_3": block("up_conv.0"),
        "MultiDomainConv_1": {
            "ConvTranspose_0": {"kernel": iohw_to_hwio_flipped(sd["up_transpose_conv.1.layers.0.image_conv.weight"])},
            "ConvTranspose_1": {"kernel": iohw_to_hwio_flipped(sd["up_transpose_conv.1.layers.0.kspace_conv.weight"])},
        },
        "MultiDomainConvBlock_4": block("up_conv.1.0"),
        "Conv_0": {"kernel": oihw_to_hwio(sd["up_conv.1.1.weight"]), "bias": sd["up_conv.1.1.bias"]},
    }
    net = MultiDomainUnet2d(out_channels=4, chans=8, num_pool_layers=2,
                            fft_centered=True, fft_normalization="ortho")
    got = np.asarray(net.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, rtol=1e-3, atol=1e-4)


def test_recurrent_init_matches_reference(ref):
    """RVN hidden-state initializer (dilated conv stack -> per-depth 1x1 heads)
    vs reference recurrentvarnet.py:17 with imported weights."""
    from mridc_tpu.models.recon.rvn import RecurrentInit
    from mridc_tpu.utils.torch_import import oihw_to_hwio

    rv = reference_loader.load("mridc.collections.reconstruction.nn.recurrentvarnet.recurrentvarnet")
    torch.manual_seed(43)
    tnet = rv.RecurrentInit(2, 8, channels=(4, 4), dilations=(1, 2), depth=3, multiscale_depth=1).eval()
    x = np.random.default_rng(7).standard_normal((1, 2, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()  # [B, out, H, W, depth]

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = {}
    for i in range(2):
        params[f"Conv_{i}"] = {"kernel": oihw_to_hwio(sd[f"conv_blocks.{i}.1.weight"]),
                               "bias": sd[f"conv_blocks.{i}.1.bias"]}
    for j in range(3):
        params[f"Conv_{2 + j}"] = {"kernel": oihw_to_hwio(sd[f"out_blocks.{j}.0.weight"]),
                                   "bias": sd[f"out_blocks.{j}.0.bias"]}
    net = RecurrentInit(out_channels=8, channels=(4, 4), dilations=(1, 2), depth=3)
    got = np.asarray(net.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))))
    # ours [B, H, W, out, depth] -> [B, out, H, W, depth]
    np.testing.assert_allclose(np.moveaxis(got, 3, 1), want, rtol=1e-4, atol=1e-5)


def test_cirim_multicascade_matches_reference(ref):
    """Two-cascade CIRIM chaining vs the reference loop (cirim.py:105-127):
    cascade 0 SENSE-inits, cascade 1 starts from the previous final eta
    detached, hidden states reset per cascade."""
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_cirim_params

    torch.manual_seed(31)
    blocks = [
        ref["rim_block"].RIMBlock(
            recurrent_layer="IndRNN",
            conv_filters=[8, 8, 2], conv_kernels=[5, 3, 3], conv_dilations=[1, 2, 1],
            conv_bias=[True, True, False],
            recurrent_filters=[8, 8, 0], recurrent_kernels=[1, 1, 0],
            recurrent_dilations=[1, 1, 0], recurrent_bias=[True, True, False],
            depth=2, time_steps=4, no_dc=True,
            fft_centered=True, fft_normalization="ortho", spatial_dims=[-2, -1], coil_dim=1,
        ).eval()
        for _ in range(2)
    ]
    y, sens, mask = _inputs()
    with torch.no_grad():
        prediction = torch.from_numpy(y).clone()
        preds_all = []
        for i, blk in enumerate(blocks):
            prediction, _ = blk(
                prediction,
                torch.from_numpy(y),
                torch.from_numpy(sens),
                torch.from_numpy(mask),
                prediction=None,
                hx=None,
                sigma=1.0,
                keep_prediction=False if i == 0 else True,
            )
            preds_all.append([p.numpy() for p in prediction])
    want = np.stack([np.stack(c) for c in preds_all])  # [cascades, T, B, H, W, 2]

    state = {}
    for c, blk in enumerate(blocks):
        state.update({f"cirim.{c}.{k}": v.numpy() for k, v in blk.state_dict().items()})
    params = import_cirim_params(state, num_cascades=2)
    model = build_model(
        {
            "model_name": "CIRIM", "num_cascades": 2, "time_steps": 4,
            "conv_filters": [8, 8, 2], "recurrent_filters": [8, 8, 0],
            "fft_centered": True, "fft_normalization": "ortho",
        }
    )
    out = model.apply(
        {"params": params}, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask[..., 0])
    )
    np.testing.assert_allclose(np.asarray(out.intermediates), want, rtol=2e-3, atol=2e-4)
