"""Multitask (joint reconstruction+segmentation) model tests (reference:
tests/collections/multitask/rs/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mridc_tpu.models import build_model

B, C, H, W, CLS = 1, 2, 32, 32, 3

COMMON = {
    "fft_centered": True,
    "fft_normalization": "ortho",
    "segmentation_module_output_channels": CLS,
    "segmentation_module_channels": 4,
    "segmentation_module_pooling_layers": 2,
}

CONFIGS = [
    {
        "model_name": "MTLRS",
        "joint_reconstruction_segmentation_module_cascades": 2,
        "reconstruction_module_num_cascades": 1,
        "reconstruction_module_time_steps": 8,
        "reconstruction_module_conv_filters": [8, 8, 2],
        "reconstruction_module_recurrent_filters": [8, 8, 0],
        "segmentation_module": "attentionunet",
        **COMMON,
    },
    {"model_name": "IDSLR", "num_iters": 2, **COMMON},
    {"model_name": "IDSLRUNET", "num_iters": 2, **COMMON},
    {"model_name": "SEGNET", "num_iters": 2, **COMMON},
    {
        "model_name": "RECSEGNET",
        "reconstruction_module_channels": 4,
        "reconstruction_module_pooling_layers": 2,
        **COMMON,
    },
    {
        "model_name": "SERANET",
        "num_iterations": 2,
        "reconstruction_module_channels": 4,
        "reconstruction_module_pooling_layers": 2,
        "recurrent_hidden_channels": 8,
        **COMMON,
    },
]


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((B, C, H, W, 2)).astype(np.float32))
    sens = jnp.asarray(rng.standard_normal((B, C, H, W, 2)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, 1, H, W)) < 0.4).astype(np.float32))
    return y, sens, mask


@pytest.mark.parametrize(
    "cfg",
    [
        # MTLRS/SERANET forwards cost 30-50 s — full tier only
        pytest.param(c, marks=pytest.mark.slow)
        if c["model_name"] in ("MTLRS", "SERANET")
        else c
        for c in CONFIGS
    ],
    ids=lambda c: c["model_name"] if isinstance(c, dict) else None,
)
def test_multitask_forward(cfg):
    model = build_model(cfg)
    y, sens, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    out, seg = model.apply(variables, y, sens, mask)
    assert out.prediction.shape == (B, H, W, 2)
    assert seg.shape == (B, H, W, CLS)
    assert bool(jnp.isfinite(out.prediction).all())
    assert bool(jnp.isfinite(seg).all())


@pytest.mark.slow
def test_mtlrs_returns_intermediates():
    model = build_model(CONFIGS[0])
    y, sens, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    out, seg = model.apply(variables, y, sens, mask)
    # rs_cascades(2) x recon cascades(1) stacked on axis 0, 8 time steps
    assert out.intermediates.shape == (2, 8, B, H, W, 2)


def test_seg_path_does_not_backprop_to_recon():
    """The reference computes the seg input under no_grad; the seg loss must
    not produce gradients in the reconstruction trunk."""
    cfg = CONFIGS[4]  # RecSegUNet: clean separation
    model = build_model(cfg)
    y, sens, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)

    def seg_loss(params):
        _, seg = model.apply({"params": params}, y, sens, mask)
        return (seg**2).mean()

    grads = jax.grad(seg_loss)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    recon_norms = [jnp.abs(g).max() for p, g in flat if "Unet_0" in str(p)]
    seg_norms = [jnp.abs(g).max() for p, g in flat if "Unet_1" in str(p)]
    assert max(float(x) for x in recon_norms) == 0.0
    assert max(float(x) for x in seg_norms) > 0.0


@pytest.mark.slow
def test_mtlrs_psf1d_matches_full():
    """dc_mode=psf1d is an exact identity in the MTLRS recon trunk too."""
    import jax
    import numpy as np

    from mridc_tpu.models import build_model

    rng = np.random.default_rng(41)

    def rv(x):
        return np.stack([x.real, x.imag], -1).astype(np.float32)

    b, c, h, w = 1, 2, 16, 16
    y = rv((rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64))
    sens = rv((rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64))
    mask = np.zeros((b, 1, h, w), np.float32)
    mask[..., ::2] = 1.0
    cfg = {
        "model_name": "MTLRS",
        "joint_reconstruction_segmentation_module_cascades": 2,
        "reconstruction_module_num_cascades": 1,
        "reconstruction_module_time_steps": 2,
        "reconstruction_module_conv_filters": [4, 4, 2],
        "reconstruction_module_recurrent_filters": [4, 4, 0],
        "segmentation_module": "unet",
        "segmentation_module_output_channels": 2,
        "segmentation_module_channels": 4,
        "segmentation_module_pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    m_full = build_model(cfg)
    m_fast = build_model({**cfg, "dc_mode": "psf1d"})
    variables = m_full.init(jax.random.PRNGKey(0), y, sens, mask)
    out_full, seg_full = m_full.apply(variables, y, sens, mask)
    out_fast, seg_fast = m_fast.apply(variables, y, sens, mask)
    pf, pq = np.asarray(out_full.prediction), np.asarray(out_fast.prediction)
    np.testing.assert_allclose(pq, pf, rtol=0, atol=5e-4 * np.abs(pf).max())
    sf, sq = np.asarray(seg_full), np.asarray(seg_fast)
    np.testing.assert_allclose(sq, sf, rtol=0, atol=5e-4 * max(np.abs(sf).max(), 1e-6))


def test_mtlrs_bf16_opt_in():
    """compute_dtype=bfloat16 on MTLRS: f32 params identical to the f32 build
    (checkpoint-compatible), finite output in the same ballpark. The knob
    covers the recon trunk only (the seg head stays f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mridc_tpu.models import build_model

    rng = np.random.default_rng(42)

    def rv(x):
        return np.stack([x.real, x.imag], -1).astype(np.float32)

    b, c, h, w = 1, 2, 16, 16
    y = rv((rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64))
    sens = rv((rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64))
    mask = np.zeros((b, 1, h, w), np.float32)
    mask[..., ::2] = 1.0
    cfg = {
        "model_name": "MTLRS",
        "joint_reconstruction_segmentation_module_cascades": 2,
        "reconstruction_module_num_cascades": 1,
        "reconstruction_module_time_steps": 2,
        "reconstruction_module_conv_filters": [4, 4, 2],
        "reconstruction_module_recurrent_filters": [4, 4, 0],
        "segmentation_module": "unet",
        "segmentation_module_output_channels": 2,
        "segmentation_module_channels": 4,
        "segmentation_module_pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    exact = build_model(cfg)
    fast = build_model({**cfg, "compute_dtype": "bfloat16"})
    v = exact.init(jax.random.PRNGKey(0), y, sens, mask)
    v_fast = fast.init(jax.random.PRNGKey(0), y, sens, mask)
    assert jax.tree_util.tree_structure(v_fast["params"]) == jax.tree_util.tree_structure(v["params"])
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(v_fast["params"]))
    out_f, seg_f = exact.apply(v, y, sens, mask)
    out_b, seg_b = fast.apply(v, y, sens, mask)
    pb = np.asarray(out_b.prediction)
    assert np.isfinite(pb).all() and np.isfinite(np.asarray(seg_b)).all()
    pf = np.asarray(out_f.prediction)
    assert np.abs(pb - pf).max() > 0  # bf16 actually engaged
    rel = np.linalg.norm(pb - pf) / np.linalg.norm(pf)
    assert rel < 0.1, rel


@pytest.mark.parametrize(
    "cfg",
    [
        pytest.param(c, marks=pytest.mark.slow) if c["model_name"] == "SERANET" else c
        for c in CONFIGS
        if c["model_name"] != "MTLRS"  # MTLRS has its own knob test above
    ],
    ids=lambda c: (c.get("model_name") if isinstance(c, dict) else None),
)
def test_multitask_bf16_opt_in(cfg):
    """compute_dtype=bfloat16 on the IDSLR/SegNet/RecSeg/SERANet family:
    identical f32 params (checkpoint-compatible), finite recon+seg near the
    f32 ones, bf16 engaged. DC/FFT chains, group norms and the attention
    gate stay f32."""
    y, sens, mask = _inputs()
    exact = build_model(cfg)
    fast = build_model({**cfg, "compute_dtype": "bfloat16"})
    v = exact.init(jax.random.PRNGKey(0), y, sens, mask)
    v_fast = fast.init(jax.random.PRNGKey(0), y, sens, mask)
    assert jax.tree_util.tree_structure(v_fast["params"]) == jax.tree_util.tree_structure(v["params"])
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(v_fast["params"]))
    out_e, seg_e = exact.apply(v, y, sens, mask)
    out_f, seg_f = fast.apply(v, y, sens, mask)
    pe, pf = np.asarray(out_e.prediction), np.asarray(out_f.prediction)
    se, sf = np.asarray(seg_e), np.asarray(seg_f)
    assert np.isfinite(pf).all() and np.isfinite(sf).all()
    assert np.abs(pf - pe).max() + np.abs(sf - se).max() > 0  # engaged
    rel_p = np.linalg.norm(pf - pe) / max(np.linalg.norm(pe), 1e-6)
    rel_s = np.linalg.norm(sf - se) / max(np.linalg.norm(se), 1e-6)
    assert rel_p < 0.1, rel_p
    assert rel_s < 0.15, rel_s
    # gradients stay finite and nonzero through the bf16 stacks
    def _loss(p):
        out, seg = fast.apply({"params": p}, y, sens, mask, train=True)
        return (out.prediction ** 2).mean() + (seg ** 2).mean()
    g = jax.grad(_loss)(v["params"])
    gn = float(sum(jnp.abs(t).sum() for t in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0
