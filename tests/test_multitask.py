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


def test_jrscirim_is_mtlrs_upstream():
    """Upstream proof for the JRSCIRIM -> MTLRS registry alias
    (reference launch.py:78 dispatches JRSCIRIM): the reference's
    jrscirim_base/jrscirim_block.py is CODE-identical to
    mtlrs_base/mtlrs_block.py after normalizing identifier renames
    (keep_eta->keep_prediction, accumulate_estimates->accumulate_predictions,
    eta->prediction locals, JRSCIRIM->MTLRS), the v1 utils.coil_combination
    vs v2 utils.coil_combination_method name, f-string vs .format, type
    annotations, and the __init__ fft defaults (True/ortho vs False/backward
    — every config sets these explicitly). The top-level models share the
    cascade/task-adaption wiring (jrscirim.py:145-181 == mtlrs.py:141-177).
    Any future graph divergence fails here and invalidates the alias."""
    import re

    renames = (
        (r"JRSCIRIM", "MTLRS"),
        (r"keep_eta", "keep_prediction"),
        (r"accumulate_estimates", "accumulate_predictions"),
        (r"cascades_etas", "cascades_predictions"),
        (r"time_steps_etas", "time_steps_predictions"),
        (r"cascade_eta", "cascade_prediction"),
        (r"time_step_eta", "time_step_prediction"),
        (r"\bpred\b", "prediction"),
        (r"utils\.coil_combination\(", "utils.coil_combination_method("),
        (r"rnn_utils\.", "utils."),
        (r"#.*", ""),
        # cosmetic upstream deltas, each verified by hand:
        (r'"The input channels must be either 1 or 2. Found: \{\}"\.format\(self\.input_channels\)',
         'f"The input channels must be either 1 or 2. Found: {self.input_channels}"'),
        (r"fft_centered: bool = True", "fft_centered: bool = False"),
        (r'fft_normalization: str = "ortho"', 'fft_normalization: str = "backward"'),
        (r"-> Tuple\[List\[Any\], Any, Optional\[Any\]\]",
         "-> Tuple[Union[List, torch.Tensor], torch.Tensor]"),
        (r"def process_intermediate_prediction\(self, prediction, sensitivity_maps, target, "
         r"do_coil_combination=False\):",
         "def process_intermediate_prediction( self, prediction: Union[list, torch.Tensor], "
         "sensitivity_maps: torch.Tensor, target: torch.Tensor, do_coil_combination: bool = False, "
         ") -> torch.Tensor:"),
    )

    def norm(path):
        src = open(path).read()
        src = re.sub(r'"""[\s\S]*?"""', '""', src)
        src = src.replace("process_intermediate_pred", "process_intermediate_prediction")
        for old, new in renames:
            src = re.sub(old, new, src)
        lines = []
        for line in src.splitlines():
            line = re.sub(r"\s+", " ", line).strip()
            if line and not line.startswith(("import ", "from ", "__all__")):
                lines.append(line)
        flat = re.sub(r"\s+", "", " ".join(lines))
        flat = flat.replace('""', "").replace(",)", ")")  # docstring remnants, trailing commas
        return flat

    a = norm("/root/reference/mridc/collections/segmentation/models/jrscirim_base/jrscirim_block.py")
    b = norm("/root/reference/mridc/collections/multitask/rs/nn/mtlrs_base/mtlrs_block.py")
    assert a == b, "reference JRSCIRIMBlock diverged from MTLRSBlock — alias no longer valid"


def test_jrscirim_dispatches_to_mtlrs():
    from mridc_tpu.launch import model_task
    from mridc_tpu.models import build_model
    from mridc_tpu.models.multitask.models import MTLRS

    cfg = {
        "model_name": "JRSCIRIM",
        "joint_reconstruction_segmentation_module_cascades": 1,
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
    model = build_model(cfg)
    assert isinstance(model, MTLRS)
    assert model_task("JRSCIRIM") == "multitask"

    rng = np.random.default_rng(0)
    b, c, h, w = 1, 2, 16, 16
    y = jnp.asarray(rng.standard_normal((b, c, h, w, 2)).astype(np.float32))
    sens = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
    sens /= np.sqrt((sens**2).sum(axis=(1, -1), keepdims=True))
    mask = np.ones((b, 1, h, w, 1), np.float32)
    v = model.init(jax.random.PRNGKey(0), y, jnp.asarray(sens), jnp.asarray(mask), None)
    out, seg = model.apply(v, y, jnp.asarray(sens), jnp.asarray(mask), None)
    assert seg.shape == (b, h, w, 2)
    assert np.isfinite(np.asarray(out.prediction)).all()


def test_mtlrs_seg_remat_is_value_exact():
    """The train-path seg-module remat (models.py _make_seg_module) must be
    bit-identical in loss AND grads to the unwrapped module, and must not
    change the param tree (explicit name pins the auto-naming)."""
    import jax.tree_util as tu

    import mridc_tpu.models.multitask.models as mt
    from mridc_tpu.models import build_model

    model = build_model({**CONFIGS[0], "reconstruction_module_time_steps": 2})
    y, sens, mask = _inputs()
    p_eval = model.init(jax.random.PRNGKey(0), y, sens, mask)["params"]
    p_train = model.init(jax.random.PRNGKey(0), y, sens, mask, train=True)["params"]
    assert sorted(p_eval.keys()) == sorted(p_train.keys())

    def loss(p):
        out, seg = model.apply({"params": p}, y, sens, mask, train=True)
        return jnp.mean(out.prediction**2) + jnp.mean(seg**2)

    l1, g1 = jax.value_and_grad(loss)(p_eval)

    orig = mt._make_seg_module

    def noremat(*a, **kw):
        kw["remat"] = False
        return orig(*a, **kw)

    mt._make_seg_module = noremat
    try:
        l0, g0 = jax.value_and_grad(loss)(p_eval)
    finally:
        mt._make_seg_module = orig
    assert float(l1) == float(l0)
    for a, b in zip(tu.tree_leaves(g1), tu.tree_leaves(g0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
