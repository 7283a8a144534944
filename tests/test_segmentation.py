"""Segmentation model + loss tests (reference:
tests/collections/segmentation/models/test_*.py style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mridc_tpu.losses.segmentation import Dice, CrossEntropyLoss, cross_entropy_loss, dice_loss, one_hot
from mridc_tpu.models import build_model

B, H, W, CLS = 1, 32, 32, 3


SEG_CONFIGS = [
    {"model_name": "SegmentationUNet", "segmentation_module_channels": 4, "segmentation_module_pooling_layers": 2},
    {"model_name": "SegmentationAttentionUNet", "segmentation_module_channels": 4, "segmentation_module_pooling_layers": 2},
    {"model_name": "SegmentationLambdaUNet", "segmentation_module_channels": 4, "segmentation_module_pooling_layers": 2},
    {"model_name": "SegmentationVNet", "segmentation_module_channels": 4, "segmentation_module_pooling_layers": 2},
    {"model_name": "SegmentationDYNUNet", "segmentation_module_channels": 4, "segmentation_module_pooling_layers": 2},
    {
        "model_name": "SegmentationUNetR",
        "segmentation_module_channels": 8,
        "segmentation_module_patch_size": 8,
        "segmentation_module_hidden_size": 32,
        "segmentation_module_mlp_dim": 64,
        "segmentation_module_num_layers": 4,
        "segmentation_module_num_heads": 2,
    },
]


@pytest.mark.parametrize("cfg", SEG_CONFIGS, ids=lambda c: c["model_name"])
def test_seg_forward_shapes(cfg):
    cfg = dict(cfg, segmentation_module_output_channels=CLS)
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, W, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, mutable=["batch_stats"])
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape == (B, H, W, CLS)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.slow
def test_seg_3d_unet():
    cfg = {
        "model_name": "Segmentation3DUNet",
        "segmentation_module_output_channels": CLS,
        "segmentation_module_channels": 4,
        "segmentation_module_pooling_layers": 2,
    }
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 4, H, W, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(variables, x, mutable=["batch_stats"])
    assert logits.shape == (B, 4, H, W, CLS)


def test_dice_perfect_prediction():
    labels = np.random.default_rng(0).integers(0, CLS, (B, H, W))
    target = np.asarray(one_hot(jnp.asarray(labels), CLS))
    # logits that softmax to ~the target
    logits = 20.0 * target
    score, loss = dice_loss(jnp.asarray(target), jnp.asarray(logits), sigmoid=False, softmax=True)
    assert float(score) > 0.99
    assert float(loss) < 0.01


def test_dice_worst_prediction():
    target = np.zeros((B, H, W, 2), np.float32)
    target[..., 0] = 1
    logits = np.zeros((B, H, W, 2), np.float32)
    logits[..., 1] = 20.0
    score, loss = dice_loss(jnp.asarray(target), jnp.asarray(logits), sigmoid=False, softmax=True,
                            include_background=True)
    assert float(score) < 0.05


def test_cross_entropy_matches_perfect():
    labels = jnp.asarray(np.random.default_rng(1).integers(0, CLS, (B, H, W)))
    logits = 20.0 * one_hot(labels, CLS)
    assert float(cross_entropy_loss(labels, logits)) < 1e-3
    ce = CrossEntropyLoss(weight=[1.0, 2.0, 1.0])
    assert float(ce(labels, logits)) < 1e-3


def test_dice_class_api():
    d = Dice(include_background=False, softmax=True, sigmoid=False)
    labels = jnp.asarray(np.random.default_rng(2).integers(0, CLS, (B, H, W)))
    target = one_hot(labels, CLS)
    _, loss = d(target, 20.0 * target)
    assert float(loss) < 0.01


SEG_BF16_CONFIGS = {
    "SegmentationUNet": {},
    "SegmentationAttentionUNet": {},
    "Segmentation3DUNet": {"volume": True, "slow": True},
    # lambda attention amplifies rounding through the InstanceNorm stack at
    # random weights (rel ~0.9 at 5 blocks); certified by an A/B training run
    # converging step-for-step with f32 (docs/performance.md)
    "SegmentationLambdaUNet": {"tol": 1.5},
    # NOTE: the shared test input must stay single-channel for VNet's
    # 16 % in_chans constraint
    "SegmentationVNet": {"slow": True},
    "SegmentationDYNUNet": {"extra": {"segmentation_module_strides": (1, 2, 2)}, "slow": True},
    "SegmentationUNetR": {
        "extra": {
            "segmentation_module_hidden_size": 32,
            "segmentation_module_mlp_dim": 32,
            "segmentation_module_num_heads": 4,
        },
        "slow": True,
    },
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if SEG_BF16_CONFIGS[n].get("slow") else n
        for n in sorted(SEG_BF16_CONFIGS)
    ],
)
def test_seg_bf16_opt_in(name):
    """compute_dtype=bfloat16 is honored by EVERY segmentation trunk:
    identical f32 params (checkpoint-compatible), finite logits near the f32
    ones, bf16 engaged. Norm stats / softmaxes / logits stay f32."""
    spec = SEG_BF16_CONFIGS[name]
    cfg = {
        "model_name": name.upper(),
        "segmentation_module_output_channels": 2,
        "segmentation_module_channels": 8,
        "segmentation_module_pooling_layers": 2,
        **spec.get("extra", {}),
    }
    rng = np.random.default_rng(0)
    shape = (1, 2, 32, 32, 1) if spec.get("volume") else (1, 32, 32, 1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    exact = build_model(cfg)
    fast = build_model({**cfg, "compute_dtype": "bfloat16"})
    v = exact.init(jax.random.PRNGKey(0), x)
    v_fast = fast.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_fast["params"]) == jax.tree_util.tree_structure(v["params"])
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(v_fast["params"]))
    lf = np.asarray(fast.apply(v, x))
    le = np.asarray(exact.apply(v, x))
    assert lf.dtype == np.float32  # logits come back f32
    assert np.isfinite(lf).all()
    assert np.abs(lf - le).max() > 0  # bf16 actually engaged
    assert np.linalg.norm(lf - le) / max(np.linalg.norm(le), 1e-6) < spec.get("tol", 0.1)
    # gradients stay finite and nonzero through the bf16 stacks
    g = jax.grad(lambda p: (fast.apply({"params": p}, x, train=False) ** 2).mean())(v["params"])
    gn = float(sum(jnp.abs(t).sum() for t in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0
