"""Live BatchNorm running statistics (``train_batch_stats``).

Reference BN sites: mwcnn/mwcnn.py:154, conv/conv2d.py:53,
vnet_base/vnet_block.py:33, lambda_unet_base/lambda_unet_block.py:70 — all
torch.nn.BatchNorm2d with momentum-tracked running stats. Default stays the
import-parity frozen mode; this file pins the live mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mridc_tpu.models import build_model
from mridc_tpu.nn.layers import TorchBatchNorm


def test_live_bn_momentum_matches_torch():
    """Running-stat updates must follow torch's exact formula: biased batch
    var normalizes, UNBIASED batch var feeds the running var, momentum
    weights the new stat."""
    import torch

    rng = np.random.default_rng(0)
    c = 5
    torch_bn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    torch_bn.train()

    mod = TorchBatchNorm(eps=1e-5, momentum=0.1, live=True)
    x0 = rng.standard_normal((2, 7, 6, c)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x0), train=True)
    params = variables["params"]
    bs = variables["batch_stats"]

    for i in range(3):
        x = (rng.standard_normal((2, 7, 6, c)) * (i + 1) + i).astype(np.float32)
        y, mut = mod.apply(
            {"params": params, "batch_stats": bs}, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
        bs = mut["batch_stats"]
        # NHWC -> NCHW for torch
        ty = torch_bn(torch.from_numpy(np.moveaxis(x, -1, 1)))
        np.testing.assert_allclose(np.asarray(y), np.moveaxis(ty.detach().numpy(), 1, -1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(bs["mean"]), torch_bn.running_mean.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(bs["var"]), torch_bn.running_var.numpy(), atol=2e-5)

    # eval mode uses the tracked stats, exactly like torch
    torch_bn.eval()
    x = rng.standard_normal((2, 7, 6, c)).astype(np.float32)
    y = mod.apply({"params": params, "batch_stats": bs}, jnp.asarray(x), train=False)
    ty = torch_bn(torch.from_numpy(np.moveaxis(x, -1, 1)))
    np.testing.assert_allclose(np.asarray(y), np.moveaxis(ty.detach().numpy(), 1, -1), atol=2e-5)


def test_frozen_bn_unchanged_by_default():
    """Default TorchBatchNorm keeps mean/var in params (import parity) and
    declares no batch_stats collection."""
    mod = TorchBatchNorm()
    x = jnp.ones((2, 4, 4, 3))
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" not in variables
    assert set(variables["params"]) == {"scale", "bias", "mean", "var"}


def test_vnet_builder_defaults_frozen():
    model = build_model({"model_name": "SEGMENTATIONVNET", "segmentation_module_output_channels": 2})
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in variables


def test_knob_guard_rejects_unsupported_models():
    with pytest.raises(ValueError, match="train_batch_stats"):
        build_model({"model_name": "CIRIM", "train_batch_stats": True})
    with pytest.raises(ValueError, match="train_batch_stats"):
        build_model({"model_name": "CRNNET", "train_batch_stats": True})


@pytest.mark.slow
def test_vnet_from_scratch_train_then_eval_uses_learned_stats():
    """The reference train-then-eval contract: a from-scratch VNet trained in
    live mode must evaluate with the TRAINED running stats, not init stats."""
    from mridc_tpu.train.task_trainers import SegmentationTrainer

    rng = np.random.default_rng(1)
    model = build_model({
        "model_name": "SEGMENTATIONVNET",
        "segmentation_module_output_channels": 2,
        "train_batch_stats": True,
    })
    trainer = SegmentationTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3})
    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32) * 3 + 1
    seg = np.zeros((2, 32, 32, 2), np.float32)
    seg[..., 0] = 1.0
    batch = {"image": x, "segmentation": seg}
    trainer.init_state(jax.random.PRNGKey(0), batch)
    assert trainer.state.batch_stats is not None
    init_bs = jax.tree_util.tree_map(np.asarray, trainer.state.batch_stats)

    for _ in range(3):
        metrics = trainer.training_batch(batch)
        assert np.isfinite(float(metrics["loss"]))

    trained_bs = jax.tree_util.tree_map(np.asarray, trainer.state.batch_stats)
    moved = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), init_bs, trained_bs)
    assert max(jax.tree_util.tree_leaves(moved)) > 1e-3  # stats actually tracked

    # eval goes through the trainer's jitted eval step with the trained stats
    logits_trained = trainer.predict_batch(batch)
    logits_init = np.asarray(
        model.apply(
            {"params": trainer.state.params, "batch_stats": init_bs},
            jnp.asarray(x),
            train=False,
        )
    )
    assert np.isfinite(logits_trained).all()
    assert np.abs(logits_trained - logits_init).max() > 1e-5  # eval consumes the TRAINED stats


def test_live_bn_archive_roundtrip(tmp_path):
    from mridc_tpu.train.checkpoints import load_archive, save_archive
    from flax import serialization

    cfg = {"model_name": "SEGMENTATIONVNET", "segmentation_module_output_channels": 2,
           "train_batch_stats": True}
    model = build_model(cfg)
    x = jnp.ones((1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    p = tmp_path / "m.mridc"
    save_archive(p, cfg, variables["params"], batch_stats=variables["batch_stats"])
    _, weights = load_archive(p)
    tree = serialization.msgpack_restore(weights)
    assert set(tree) == {"params", "batch_stats"}
    restored = jax.tree_util.tree_map(np.asarray, tree["batch_stats"])
    orig = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, orig, restored)
