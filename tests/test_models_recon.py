"""Model-zoo shape tests (reference style: parametrize over config dicts,
build via the registry, forward, check output spatial shape —
tests/collections/reconstruction/models/test_*.py)."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mridc_tpu.models import available_models, build_model
from mridc_tpu.nn.sens import SensitivityModel


B, C, H, W = 1, 3, 32, 32


def _rv(x):
    return np.stack([x.real, x.imag], -1).astype(np.float32)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    y = (rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64)
    sens = (rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64)
    sens = sens / np.sqrt((np.abs(sens) ** 2).sum(1, keepdims=True))
    mask = (rng.random((B, 1, H, W)) < 0.4).astype(np.float32)
    return jnp.asarray(_rv(y)), jnp.asarray(_rv(sens)), jnp.asarray(mask)


COMMON = {
    "fft_centered": True,
    "fft_normalization": "ortho",
    "spatial_dims": (-2, -1),
    "coil_dim": 1,
    "coil_combination_method": "SENSE",
}


CONFIGS = [
    {"model_name": "ZF", **COMMON},
    {"model_name": "UNet", "channels": 8, "pooling_layers": 2, **COMMON},
    {"model_name": "CCNN", "num_cascades": 2, "hidden_channels": 8, "n_convs": 2, **COMMON},
    {"model_name": "CRNN", "num_iterations": 3, "hidden_channels": 8, "n_convs": 2, **COMMON},
    {
        "model_name": "CIRIM",
        "num_cascades": 2,
        "time_steps": 8,
        "recurrent_layer": "IndRNN",
        "conv_filters": [16, 16, 2],
        "recurrent_filters": [16, 16, 0],
        **COMMON,
    },
    {"model_name": "VN", "num_cascades": 2, "channels": 4, "pooling_layers": 2, **COMMON},
    {"model_name": "CS", "num_iters": 5, **COMMON},
    {"model_name": "PICS", "num_iters": 5, **COMMON},
    {"model_name": "PG", "conjugate_gradient_iterations": 3, **COMMON},
    {
        "model_name": "RESNET", "unrolled_iterations": 2, "residual_blocks": 2, "channels": 8,
        "conjugate_gradient_dc": True, "conjugate_gradient_iterations": 2, **COMMON,
    },
    {
        "model_name": "RVN", "num_steps": 8, "recurrent_hidden_channels": 8,
        "recurrent_num_layers": 2, **COMMON,
    },
    {
        "model_name": "JOINTICNET", "num_iter": 1, "kspace_unet_num_filters": 4,
        "kspace_unet_num_pool_layers": 2, "imspace_unet_num_filters": 4,
        "imspace_unet_num_pool_layers": 2, "sens_unet_num_filters": 4,
        "sens_unet_num_pool_layers": 2, **COMMON,
    },
    {
        "model_name": "KIKINET", "num_iter": 1, "kspace_model_architecture": "CONV",
        "kspace_conv_hidden_channels": 4, "kspace_conv_n_convs": 2,
        "imspace_model_architecture": "MWCNN", "image_mwcnn_hidden_channels": 4,
        "image_mwcnn_num_scales": 2, **COMMON,
    },
    {
        "model_name": "LPD", "num_iter": 1, "num_primal": 2, "num_dual": 2,
        "primal_model_architecture": "UNET", "primal_unet_num_filters": 4,
        "primal_unet_num_pool_layers": 2, "dual_model_architecture": "UNET",
        "dual_unet_num_filters": 4, "dual_unet_num_pool_layers": 2, **COMMON,
    },
    {"model_name": "MULTIDOMAINNET", "num_filters": 4, "num_pool_layers": 2, **COMMON},
    {
        "model_name": "XPDNET", "num_iter": 1, "num_primal": 2, "use_primal_only": True,
        "image_model_architecture": "MWCNN", "mwcnn_hidden_channels": 4,
        "mwcnn_num_scales": 2, **COMMON,
    },
    {
        "model_name": "VSNET", "num_cascades": 2, "imspace_model_architecture": "CONV",
        "imspace_conv_hidden_channels": 4, "imspace_conv_n_convs": 2, **COMMON,
    },
    {
        "model_name": "DUNET", "num_iter": 1, "reg_model_architecture": "UNET",
        "unet_num_filters": 4, "unet_num_pool_layers": 2,
        "data_consistency_term": "VS", **COMMON,
    },
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c["model_name"])
def test_forward_shapes(cfg):
    y, sens, mask = _inputs()
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    out = model.apply(variables, y, sens, mask)
    assert out.prediction.shape == (B, H, W, 2)
    assert bool(jnp.isfinite(out.prediction).all())


def test_cirim_intermediates_shape():
    cfg = CONFIGS[4]
    y, sens, mask = _inputs()
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    out = model.apply(variables, y, sens, mask)
    assert out.intermediates.shape == (2, 8, B, H, W, 2)
    # last intermediate == prediction
    np.testing.assert_allclose(np.asarray(out.intermediates[-1, -1]), np.asarray(out.prediction))


def test_gru_and_mgu_cells_work():
    for layer in ("GRU", "MGU"):
        cfg = dict(CONFIGS[4], recurrent_layer=layer, num_cascades=1, time_steps=8)
        y, sens, mask = _inputs()
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
        out = model.apply(variables, y, sens, mask)
        assert out.prediction.shape == (B, H, W, 2)


def test_zf_matches_manual_sense_recon():
    y, sens, mask = _inputs()
    model = build_model(CONFIGS[0])
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    out = model.apply(variables, y, sens, mask)
    yc = np.asarray(y[..., 0] + 1j * y[..., 1])
    sc = np.asarray(sens[..., 0] + 1j * sens[..., 1])
    img = np.fft.fftshift(np.fft.ifftn(np.fft.ifftshift(yc, axes=(-2, -1)), axes=(-2, -1), norm="ortho"), axes=(-2, -1))
    want = (img * np.conj(sc)).sum(1)
    got = np.asarray(out.prediction)
    np.testing.assert_allclose(got[..., 0] + 1j * got[..., 1], want, rtol=1e-4, atol=1e-5)


def test_sensitivity_model_shapes():
    y, sens, mask = _inputs()
    model = SensitivityModel(chans=4, num_pools=2, fft_centered=True, fft_normalization="ortho")
    variables = model.init(jax.random.PRNGKey(0), y, mask)
    est = model.apply(variables, y, mask)
    assert est.shape == (B, C, H, W, 2)
    e = np.asarray(est)
    rss = np.sqrt((e[..., 0] ** 2 + e[..., 1] ** 2).sum(1))
    np.testing.assert_allclose(rss, np.ones_like(rss), rtol=1e-4)


def test_registry_lists_models():
    names = available_models()
    for n in ("CIRIM", "VN", "UNET", "ZF"):
        assert n in names
    with pytest.raises(ValueError):
        build_model({"model_name": "NOPE"})


def test_cs_fista_improves_over_zf():
    """The FISTA l1-wavelet solver must beat zero-filled reconstruction on a
    wavelet-sparse (piecewise-constant) phantom — quality check of the
    BART/sigpy replacement. (On smooth Gaussian phantoms ZF with a dense
    center is already near-optimal, so sparsity priors can't help there.)"""
    rng = np.random.default_rng(0)
    h = w = 64
    img = np.zeros((h, w), np.complex64)
    img[12:30, 10:36] = 1.0
    img[36:56, 30:54] = 0.6
    img[20:26, 44:58] = 0.9
    coils = 4
    yy, xx = np.mgrid[:h, :w]
    sens_np = np.stack(
        [np.exp(1j * 2 * np.pi * c * xx / w) * (0.5 + np.exp(-((yy - h * (c + 1) / 5) ** 2) / (h * w))) for c in range(coils)]
    ).astype(np.complex64)
    sens_np /= np.sqrt((np.abs(sens_np) ** 2).sum(0, keepdims=True))
    coil_imgs = img[None] * sens_np
    kspace = np.fft.fftshift(
        np.fft.fftn(np.fft.ifftshift(coil_imgs, axes=(-2, -1)), axes=(-2, -1), norm="ortho"), axes=(-2, -1)
    ).astype(np.complex64)

    rs = np.random.RandomState(5)
    mask2d = np.zeros((h, w), np.float32)
    mask2d[:, rs.rand(w) < 0.22] = 1
    mask2d[:, w // 2 - 3 : w // 2 + 3] = 1
    masked = kspace * mask2d

    y = jnp.asarray(_rv(masked))[None]
    s = jnp.asarray(_rv(sens_np))[None]
    m = jnp.asarray(mask2d)[None, None]

    zf = build_model({"model_name": "ZF", **COMMON})
    cs = build_model({"model_name": "CS", "cs_type": "l1_wavelet", "reg_wt": 2e-3, "num_iters": 100, **COMMON})
    zf_out = np.asarray(zf.apply(zf.init(jax.random.PRNGKey(0), y, s, m), y, s, m).prediction)
    cs_out = np.asarray(cs.apply(cs.init(jax.random.PRNGKey(0), y, s, m), y, s, m).prediction)

    from mridc_tpu.metrics.reconstruction import ssim

    tgt = (np.abs(img) / np.abs(img).max())[None]
    zf_mag = np.sqrt((zf_out**2).sum(-1))
    cs_mag = np.sqrt((cs_out**2).sum(-1))
    s_zf = ssim(tgt, zf_mag / zf_mag.max())
    s_cs = ssim(tgt, cs_mag / cs_mag.max())
    assert s_cs > s_zf, (s_cs, s_zf)


def test_varnet_bf16_compute_dtype():
    """compute_dtype=bfloat16 on VarNet: params stay f32 and identical to the
    f32 build (checkpoint-compatible), output finite and close to f32 on one
    cascade. bf16 is an opt-in perf knob (+47% on v5e, docs/performance.md);
    at random weights the 8-cascade unrolled iteration roughly doubles the
    rounding error per cascade, so the default stays f32."""
    base = {"model_name": "VN", "num_cascades": 1, "channels": 4, "pooling_layers": 2, **COMMON}
    y, s, m = _inputs()
    exact = build_model(base)
    fast = build_model({**base, "compute_dtype": "bfloat16"})
    v_exact = exact.init(jax.random.PRNGKey(0), y, s, m)
    v_fast = fast.init(jax.random.PRNGKey(0), y, s, m)
    # identical parameter trees and dtypes (bf16 is compute-only)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_exact["params"], v_fast["params"],
    )
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(v_fast["params"]))
    p_exact = np.asarray(exact.apply(v_exact, y, s, m).prediction)
    p_fast = np.asarray(fast.apply(v_exact, y, s, m).prediction)
    assert np.isfinite(p_fast).all()
    rel = np.linalg.norm(p_fast - p_exact) / np.linalg.norm(p_exact)
    assert rel < 0.05, rel


def test_instance_norm_bf16_stats_in_f32():
    """InstanceNorm on bf16 input: stats computed in f32, output keeps the
    input dtype and matches the f32 reference to bf16 rounding."""
    from mridc_tpu.nn.layers import InstanceNorm

    rng = np.random.default_rng(3)
    x_bf16 = jnp.asarray(rng.standard_normal((2, 32, 32, 4)).astype(np.float32), dtype=jnp.bfloat16)
    norm = InstanceNorm()
    out = norm.apply({}, x_bf16)
    assert out.dtype == jnp.bfloat16
    # reference: f32 norm of the SAME bf16-quantized values
    ref = np.asarray(norm.apply({}, x_bf16.astype(jnp.float32)))
    assert np.abs(np.asarray(out.astype(jnp.float32)) - ref).max() < 0.05


BF16_CONFIGS = [
    {"model_name": "UNet", "channels": 8, "pooling_layers": 2, **COMMON},
    {"model_name": "VN", "num_cascades": 1, "channels": 4, "pooling_layers": 2, **COMMON},
    {
        "model_name": "LPD", "num_iter": 1, "num_primal": 2, "num_dual": 2,
        "primal_model_architecture": "UNET", "primal_unet_num_filters": 4,
        "primal_unet_num_pool_layers": 2, "dual_model_architecture": "UNET",
        "dual_unet_num_filters": 4, "dual_unet_num_pool_layers": 2, **COMMON,
    },
    {
        "model_name": "XPDNET", "num_iter": 1, "num_primal": 2, "use_primal_only": True,
        "image_model_architecture": "UNET", "imspace_unet_num_filters": 4,
        "imspace_unet_num_pool_layers": 2, **COMMON,
    },
    {
        "model_name": "DUNET", "num_iter": 1, "reg_model_architecture": "UNET",
        "unet_num_filters": 4, "unet_num_pool_layers": 2,
        "data_consistency_term": "VS", **COMMON,
    },
    {
        "model_name": "KIKINET", "num_iter": 1, "kspace_model_architecture": "UNET",
        "kspace_unet_num_filters": 4, "kspace_unet_num_pool_layers": 2,
        "imspace_model_architecture": "UNET", "imspace_unet_num_filters": 4,
        "imspace_unet_num_pool_layers": 2, **COMMON,
    },
    {
        "model_name": "VSNET", "num_cascades": 1, "imspace_model_architecture": "UNET",
        "imspace_unet_num_filters": 4, "imspace_unet_num_pool_layers": 2, **COMMON,
    },
    {
        "model_name": "JOINTICNET", "num_iter": 1, "kspace_unet_num_filters": 4,
        "kspace_unet_num_pool_layers": 2, "imspace_unet_num_filters": 4,
        "imspace_unet_num_pool_layers": 2, "sens_unet_num_filters": 4,
        "sens_unet_num_pool_layers": 2, **COMMON,
    },
    # the use_sens_net wrapper threads compute_dtype into SensitivityModel
    {"model_name": "VN", "num_cascades": 1, "channels": 4, "pooling_layers": 2,
     "use_sens_net": True, "sens_chans": 4, "sens_pools": 2, **COMMON},
    # non-UNet regularizer branches (MWCNN / DIDN / Conv2dCascade) honor the
    # knob too — previously they silently trained f32
    {
        "model_name": "LPD", "num_iter": 1, "num_primal": 2, "num_dual": 2,
        "primal_model_architecture": "MWCNN", "primal_mwcnn_hidden_channels": 4,
        "primal_mwcnn_num_scales": 1, "dual_model_architecture": "CONV",
        "kspace_conv_hidden_channels": 4, "kspace_conv_n_convs": 2, **COMMON,
    },
    {
        "model_name": "XPDNET", "num_iter": 1, "num_primal": 2, "num_dual": 2,
        "use_primal_only": False, "image_model_architecture": "MWCNN",
        "mwcnn_hidden_channels": 4, "mwcnn_num_scales": 1,
        "kspace_model_architecture": "DIDN", "dual_didn_hidden_channels": 4,
        "dual_didn_num_dubs": 1, "dual_didn_num_convs_recon": 2, **COMMON,
    },
    {
        "model_name": "KIKINET", "num_iter": 1, "kspace_model_architecture": "DIDN",
        "kspace_didn_hidden_channels": 4, "kspace_didn_num_dubs": 1,
        "kspace_didn_num_convs_recon": 2, "imspace_model_architecture": "MWCNN",
        "image_mwcnn_hidden_channels": 4, "image_mwcnn_num_scales": 1, **COMMON,
    },
    {
        "model_name": "VSNET", "num_cascades": 1, "imspace_model_architecture": "CONV",
        "imspace_conv_hidden_channels": 4, "imspace_conv_n_convs": 2, **COMMON,
    },
    {
        "model_name": "DUNET", "num_iter": 1, "reg_model_architecture": "DIDN",
        "didn_hidden_channels": 4, "didn_num_dubs": 1, "didn_num_convs_recon": 2,
        "data_consistency_term": "VS", **COMMON,
    },
    {"model_name": "CASCADENET", "num_cascades": 1, "hidden_channels": 4, "n_convs": 2, **COMMON},
    {"model_name": "CRNNET", "num_iterations": 2, "hidden_channels": 4, "n_convs": 2, **COMMON},
    # recurrent/residual/multi-domain families
    {"model_name": "RVN", "num_steps": 8, "recurrent_hidden_channels": 8,
     "recurrent_num_layers": 2, **COMMON},
    {"model_name": "RESNET", "unrolled_iterations": 2, "residual_blocks": 2, "channels": 8,
     "conjugate_gradient_dc": True, "conjugate_gradient_iterations": 2, **COMMON},
    {"model_name": "MULTIDOMAINNET", "num_filters": 4, "num_pool_layers": 2, **COMMON},
]


@pytest.mark.parametrize(
    "cfg", BF16_CONFIGS,
    ids=lambda c: c["model_name"] + ("+sensnet" if c.get("use_sens_net") else ""),
)
def test_unet_family_bf16_opt_in(cfg):
    """compute_dtype=bfloat16 is honored by every NormUnet-based model:
    identical f32 params (checkpoint-compatible) and finite output. The knob
    is opt-in — defaults stay f32 (see test_varnet_bf16_compute_dtype for
    the error-vs-f32 characterization)."""
    y, s, m = _inputs()
    exact = build_model(cfg)
    fast = build_model({**cfg, "compute_dtype": "bfloat16"})
    v = exact.init(jax.random.PRNGKey(0), y, s, m)
    v_fast = fast.init(jax.random.PRNGKey(0), y, s, m)
    assert jax.tree_util.tree_structure(v_fast["params"]) == jax.tree_util.tree_structure(v["params"])
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(v_fast["params"]))
    p_fast = np.asarray(fast.apply(v, y, s, m).prediction)
    p_exact = np.asarray(exact.apply(v, y, s, m).prediction)
    assert np.isfinite(p_fast).all()
    # bf16 conv compute must actually engage (output differs from f32)...
    assert np.abs(p_fast - p_exact).max() > 0
    # ...but stays in the same ballpark at one iteration/cascade
    rel = np.linalg.norm(p_fast - p_exact) / np.linalg.norm(p_exact)
    assert rel < 0.1, rel


@pytest.mark.parametrize(
    "arches",
    [("MWCNN", "DIDN"), ("UNET", "UNET")],
    ids=["mwcnn+didn", "unet+unet"],
)
def test_xpdnet_scan_iterations_exact(arches):
    """scan_iterations=True runs the iterations as a lax.scan with stacked
    per-iteration params (~4x faster compiles at the default depth: init
    152 -> 35 s on CPU). stack_iteration_params converts a trained unrolled
    checkpoint to the scan layout; outputs must match exactly. The UNET+UNET
    case pins the per-iteration creation order (kspace NormUnet before image
    NormUnet) that the converter's round-robin relies on."""
    from mridc_tpu.models.recon.xpdnet import stack_iteration_params

    image_arch, kspace_arch = arches
    cfg = {
        "model_name": "XPDNET", "num_iter": 3, "num_primal": 2, "num_dual": 2,
        "use_primal_only": False,
        "image_model_architecture": image_arch,
        "mwcnn_hidden_channels": 4, "mwcnn_num_scales": 1,
        "imspace_unet_num_filters": 4, "imspace_unet_num_pool_layers": 2,
        "kspace_model_architecture": kspace_arch,
        "dual_didn_hidden_channels": 4, "dual_didn_num_dubs": 1,
        "dual_didn_num_convs_recon": 2,
        "kspace_unet_num_filters": 4, "kspace_unet_num_pool_layers": 2,
        **COMMON,
    }
    y, s, m = _inputs()
    unrolled = build_model(cfg)
    scanned = build_model({**cfg, "scan_iterations": True})
    vu = unrolled.init(jax.random.PRNGKey(0), y, s, m)
    vs = scanned.init(jax.random.PRNGKey(0), y, s, m)
    rebuilt = stack_iteration_params(vu["params"], cfg["num_iter"])
    assert jax.tree_util.tree_structure(rebuilt) == jax.tree_util.tree_structure(
        dict(vs["params"])
    )
    p_unrolled = np.asarray(unrolled.apply(vu, y, s, m).prediction)
    p_scan = np.asarray(scanned.apply({"params": rebuilt}, y, s, m).prediction)
    np.testing.assert_allclose(p_scan, p_unrolled, rtol=0, atol=1e-5 * max(np.abs(p_unrolled).max(), 1e-6))


@pytest.mark.parametrize(
    "cfg",
    [
        {
            "model_name": "KIKINET", "num_iter": 3, "kspace_model_architecture": "DIDN",
            "kspace_didn_hidden_channels": 4, "kspace_didn_num_dubs": 1,
            "kspace_didn_num_convs_recon": 2, "imspace_model_architecture": "MWCNN",
            "image_mwcnn_hidden_channels": 4, "image_mwcnn_num_scales": 1, **COMMON,
        },
        {
            "model_name": "KIKINET", "num_iter": 3, "no_dc": True,
            "kspace_model_architecture": "UNET", "kspace_unet_num_filters": 4,
            "kspace_unet_num_pool_layers": 2, "imspace_model_architecture": "UNET",
            "imspace_unet_num_filters": 4, "imspace_unet_num_pool_layers": 2, **COMMON,
        },
        {
            "model_name": "LPD", "num_iter": 3, "num_primal": 2, "num_dual": 2,
            "primal_model_architecture": "UNET", "primal_unet_num_filters": 4,
            "primal_unet_num_pool_layers": 2, "dual_model_architecture": "UNET",
            "dual_unet_num_filters": 4, "dual_unet_num_pool_layers": 2, **COMMON,
        },
        {
            "model_name": "LPD", "num_iter": 3, "num_primal": 2, "num_dual": 2,
            "primal_model_architecture": "MWCNN", "primal_mwcnn_hidden_channels": 4,
            "primal_mwcnn_num_scales": 1, "dual_model_architecture": "CONV",
            "kspace_conv_hidden_channels": 4, "kspace_conv_n_convs": 2, **COMMON,
        },
    ],
    ids=["kiki-didn+mwcnn", "kiki-unet+unet-nodc", "lpd-unet+unet", "lpd-mwcnn+conv"],
)
def test_shared_weight_scan_iterations_exact(cfg):
    """KIKINet/LPDNet scan_iterations: the reference shares ONE model per
    domain across iterations, so the scan is params-broadcast and the param
    tree is IDENTICAL to the unrolled path (checkpoints move freely, no
    conversion). Outputs must match to f32 reassociation noise — the rel-l2
    stays ~1e-6 while untrained outputs grow ~10x per iteration, so the
    tolerance is relative."""
    y, s, m = _inputs()
    unrolled = build_model(cfg)
    scanned = build_model({**cfg, "scan_iterations": True})
    vu = unrolled.init(jax.random.PRNGKey(0), y, s, m)
    vs = scanned.init(jax.random.PRNGKey(0), y, s, m)
    assert jax.tree_util.tree_structure(vu) == jax.tree_util.tree_structure(vs)
    pu = np.asarray(unrolled.apply(vu, y, s, m).prediction)
    ps = np.asarray(scanned.apply(vu, y, s, m).prediction)  # same params verbatim
    rel = np.linalg.norm(ps - pu) / max(np.linalg.norm(pu), 1e-12)
    assert rel < 1e-5, rel


def test_scan_iterations_rejects_batchnorm():
    """nn.scan here only declares the params collection, so BatchNorm's
    batch_stats would silently be unreachable — the combination must fail
    loudly (review finding: it used to crash with ScopeCollectionNotFound)."""
    y, s, m = _inputs()
    for cfg in (
        {"model_name": "KIKINET", "num_iter": 2, "kspace_model_architecture": "CONV",
         "kspace_conv_hidden_channels": 4, "kspace_conv_n_convs": 2,
         "kspace_conv_batchnorm": True, "imspace_model_architecture": "MWCNN",
         "image_mwcnn_hidden_channels": 4, "image_mwcnn_num_scales": 1,
         "scan_iterations": True, **COMMON},
        {"model_name": "LPD", "num_iter": 2, "num_primal": 2, "num_dual": 2,
         "primal_model_architecture": "UNET", "primal_unet_num_filters": 4,
         "primal_unet_num_pool_layers": 2, "dual_model_architecture": "CONV",
         "kspace_conv_hidden_channels": 4, "kspace_conv_n_convs": 2,
         "kspace_conv_batchnorm": True, "scan_iterations": True, **COMMON},
        {"model_name": "XPDNET", "num_iter": 2, "num_primal": 2,
         "use_primal_only": True, "image_model_architecture": "MWCNN",
         "mwcnn_hidden_channels": 4, "mwcnn_num_scales": 1,
         "mwcnn_batchnorm": True, "scan_iterations": True, **COMMON},
    ):
        model = build_model(cfg)
        with pytest.raises(ValueError, match="batchnorm"):
            model.init(jax.random.PRNGKey(0), y, s, m)


def test_xpdnet_scan_converter_handles_sens_net_wrapper():
    """use_sens_net wraps XPDNet params under a 'model' scope;
    stack_iteration_params converts the nested tree and keeps the
    SensitivityModel untouched (review finding: it used to reject it)."""
    from mridc_tpu.models.recon.xpdnet import stack_iteration_params

    cfg = {
        "model_name": "XPDNET", "num_iter": 2, "num_primal": 2, "num_dual": 2,
        "use_primal_only": False, "image_model_architecture": "MWCNN",
        "mwcnn_hidden_channels": 4, "mwcnn_num_scales": 1,
        "kspace_model_architecture": "DIDN", "dual_didn_hidden_channels": 4,
        "dual_didn_num_dubs": 1, "dual_didn_num_convs_recon": 2,
        "use_sens_net": True, "sens_chans": 4, "sens_pools": 2, **COMMON,
    }
    y, s, m = _inputs()
    unrolled = build_model(cfg)
    scanned = build_model({**cfg, "scan_iterations": True})
    vu = unrolled.init(jax.random.PRNGKey(0), y, s, m)
    vs = scanned.init(jax.random.PRNGKey(0), y, s, m)
    rebuilt = stack_iteration_params(vu["params"], cfg["num_iter"])
    assert jax.tree_util.tree_structure(rebuilt) == jax.tree_util.tree_structure(
        dict(vs["params"])
    )
    p_unrolled = np.asarray(unrolled.apply(vu, y, s, m).prediction)
    p_scan = np.asarray(scanned.apply({"params": rebuilt}, y, s, m).prediction)
    rel = np.linalg.norm(p_scan - p_unrolled) / max(np.linalg.norm(p_unrolled), 1e-12)
    assert rel < 1e-5, rel


def test_tpu_knobs_rejected_on_unsupported_models():
    """A TPU knob key on a model outside its support set previously ran
    silently without the knob; the registry now rejects it loudly."""
    y, s, m = _inputs()
    del y, s, m
    for cfg in (
        {"model_name": "VN", "num_cascades": 1, "channels": 4, "pooling_layers": 2,
         "scan_iterations": True, **COMMON},
        {"model_name": "UNET", "channels": 4, "pooling_layers": 2,
         "dc_mode": "psf1d", **COMMON},
        {"model_name": "CASCADENET", "num_cascades": 1, "hidden_channels": 4,
         "lane_fold": "always", **COMMON},
    ):
        with pytest.raises(ValueError, match="not supported by model"):
            build_model(cfg)
    # explicit None means "force default" and stays allowed everywhere
    build_model({"model_name": "VN", "num_cascades": 1, "channels": 4,
                 "pooling_layers": 2, "train_dc_dtype": None, **COMMON})


def test_remat_save_dc_grads_exact():
    """`remat_save_dc` saves the named 'dc_grad' activations across the
    cascade-level remat too (DC chain runs fwd x1 instead of x2 per train
    step) — a pure execution-schedule change: loss and parameter gradients
    must match the default policy exactly."""
    rng = np.random.default_rng(7)
    b, c, h, w = 2, 3, 16, 20
    y = _rv((rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64))
    s = _rv((rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64))
    mask = np.zeros((b, 1, h, w), np.float32)
    mask[..., ::2] = 1
    mask[..., w // 2 - 2 : w // 2 + 2] = 1
    cfg = {
        "model_name": "CIRIM",
        "num_cascades": 2,
        "time_steps": 3,
        "conv_filters": [8, 8, 2],
        "recurrent_filters": [8, 8, 0],
        "dc_mode": "psf1d",
        "remat_mode": "step+cascade",
        **COMMON,
    }
    m0 = build_model({**cfg, "remat_save_dc": False})
    m1 = build_model({**cfg, "remat_save_dc": True})
    v = m0.init(jax.random.PRNGKey(0), y, s, mask)

    def loss(model, p):
        out = model.apply({"params": p}, y, s, mask, train=True)
        return (out.intermediates.astype(jnp.float32) ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    assert np.allclose(float(l0), float(l1), rtol=0, atol=0)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=0, atol=1e-6 * max(1.0, float(np.abs(a).max())))
