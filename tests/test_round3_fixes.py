"""Round-3 regression tests: multi-host run-dir broadcast, task-trainer EMA,
tie-safe argmax, per-cascade SegNet loss, detached CE, and golden parity of
the quantitative loss against the reference's own code
(/root/reference/mridc/collections/quantitative/models/qcirim.py:343-399).
"""

import ast
import textwrap
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mridc_tpu.models import build_model
from mridc_tpu.train.task_trainers import (
    MultitaskTrainer,
    QuantitativeTrainer,
    SegmentationTrainer,
    _tie_safe_onehot,
    parse_loss_regularization_factors,
    quantitative_loss_fn,
    segmentation_loss_fn,
)

# ----------------------------------------------------------------- exp_manager


def test_expmanager_multiprocess_version_broadcast(tmp_path, monkeypatch):
    """All processes must derive the run dir from the broadcast stamp, not
    their local clock (round-2 bug: NameError on np swallowed by bare except
    meant every process silently used its own timestamp)."""
    import time

    from jax.experimental import multihost_utils

    from mridc_tpu.train.exp_manager import ExpManager

    broadcast_stamp = 1_500_000_000.0
    calls = {"n": 0}

    def fake_broadcast(x):
        calls["n"] += 1
        return np.asarray(broadcast_stamp, np.float64)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", fake_broadcast)
    # orbax would demand a real jax.distributed client at process_count>1;
    # the run-dir logic under test doesn't need a live checkpointer
    monkeypatch.setattr(
        "mridc_tpu.train.exp_manager.OrbaxCheckpointer", lambda *a, **k: types.SimpleNamespace()
    )
    exp = ExpManager(exp_dir=str(tmp_path), name="bcast")
    expected = time.strftime("%Y-%m-%d_%H-%M-%S", time.localtime(broadcast_stamp))
    assert calls["n"] == 1
    assert exp.log_dir.name == expected


# ------------------------------------------------------------------------- EMA


def _tree_allclose(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


@pytest.mark.slow
def test_segmentation_trainer_ema_tracks_training():
    cfg = {
        "model_name": "SegmentationUNet",
        "segmentation_module_output_channels": 2,
        "segmentation_module_channels": 4,
        "segmentation_module_pooling_layers": 2,
    }
    rng = np.random.default_rng(0)
    b, h, w = 2, 16, 16
    batch = {
        "image": rng.standard_normal((b, h, w, 1)).astype(np.float32),
        "segmentation": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))],
    }
    trainer = SegmentationTrainer(
        build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-2}, use_ema=True, ema_decay=0.5
    )
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    init_ema = jax.tree_util.tree_map(np.asarray, trainer.state.ema_params)
    for _ in range(3):
        trainer.training_batch(batch)
    # EMA must have moved off the init weights (round-2 bug: override skipped
    # the EMA update, so use_ema validation saw frozen init weights forever)
    assert not _tree_allclose(trainer.state.ema_params, init_ema)
    val = trainer.validate([batch], use_ema=True)
    assert np.isfinite(val["val_loss"])


@pytest.mark.slow
def test_multitask_trainer_ema_tracks_training():
    cfg = {
        "model_name": "RECSEGNET",
        "reconstruction_module_channels": 4,
        "reconstruction_module_pooling_layers": 2,
        "segmentation_module_channels": 4,
        "segmentation_module_pooling_layers": 2,
        "segmentation_module_output_channels": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    rng = np.random.default_rng(0)
    b, c, h, w = 1, 2, 16, 16
    batch = {
        "masked_kspace": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "sensitivity_maps": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "mask": np.ones((b, 1, h, w), np.float32),
        "initial_prediction": rng.standard_normal((b, h, w, 2)).astype(np.float32),
        "target": rng.standard_normal((b, h, w, 2)).astype(np.float32),
        "segmentation": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))],
    }
    trainer = MultitaskTrainer(
        build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-2}, use_ema=True, ema_decay=0.5
    )
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    init_ema = jax.tree_util.tree_map(np.asarray, trainer.state.ema_params)
    for _ in range(3):
        trainer.training_batch(batch)
    assert not _tree_allclose(trainer.state.ema_params, init_ema)


@pytest.mark.slow
def test_quantitative_trainer_ema_tracks_training():
    cfg = {
        "model_name": "qVN",
        "quantitative_module_gamma_regularization_factors": [1.0, 1.0, 1.0, 1.0],
        "quantitative_module_num_cascades": 1,
        "quantitative_module_channels": 4,
        "quantitative_module_pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    rng = np.random.default_rng(0)
    b, e, c, h, w = 1, 4, 2, 16, 16
    batch = {
        "kspace": rng.standard_normal((b, e, c, h, w, 2)).astype(np.float32),
        "sensitivity_maps": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "mask": np.ones((b, 1, h, w), np.float32),
        "maps_init": np.abs(rng.standard_normal((b, h, w, 4))).astype(np.float32),
        "maps_target": np.abs(rng.standard_normal((b, h, w, 4))).astype(np.float32),
        "TEs": np.asarray([3.0, 11.5, 20.0, 28.5], np.float32),
        "mask_brain": np.ones((b, h, w), np.float32),
    }
    trainer = QuantitativeTrainer(
        build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-2}, use_ema=True, ema_decay=0.5
    )
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    init_ema = jax.tree_util.tree_map(np.asarray, trainer.state.ema_params)
    for _ in range(3):
        trainer.training_batch(batch)
    assert not _tree_allclose(trainer.state.ema_params, init_ema)


# -------------------------------------------------------------- tie-safe preds


def test_tie_safe_onehot_on_exact_ties():
    logits = np.zeros((2, 4, 4, 3), np.float32)  # all-tied logits
    pred = _tie_safe_onehot(logits)
    assert pred.shape == logits.shape
    assert np.all(pred.sum(-1) == 1.0)  # exactly one class per pixel
    # and it still matches argmax on untied logits
    logits = np.random.default_rng(0).standard_normal((2, 4, 4, 3)).astype(np.float32)
    assert np.array_equal(_tie_safe_onehot(logits).argmax(-1), logits.argmax(-1))


# --------------------------------------------------------------- seg loss form


def test_detach_ce_blocks_gradient():
    rng = np.random.default_rng(0)
    target = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (1, 8, 8))]
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    t = jnp.asarray(target)

    # reference quirk: with detach_ce the CE term changes the loss VALUE but
    # never the gradient — scaling ce_weight must leave grads identical
    def loss(lg, ce_w, detach):
        return segmentation_loss_fn(t, lg, ce_weight=ce_w, detach_ce=detach)

    g0 = jax.grad(lambda lg: loss(lg, 0.0, True))(logits)
    g5 = jax.grad(lambda lg: loss(lg, 5.0, True))(logits)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g5), atol=0)
    assert float(loss(logits, 5.0, True)) != float(loss(logits, 0.0, True))
    # with detach_ce=False, CE does backprop
    g_live = jax.grad(lambda lg: loss(lg, 5.0, False))(logits)
    assert float(jnp.abs(np.asarray(g_live) - np.asarray(g0)).max()) > 0.0
    # CE-only + detach_ce would train with zero gradients everywhere: rejected loudly
    with pytest.raises(ValueError, match="ZERO gradient"):
        segmentation_loss_fn(t, logits, use_dice=False, detach_ce=True)


def test_segmentation_loss_fn_stack_averages():
    rng = np.random.default_rng(0)
    target = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (1, 8, 8))]
    t = jnp.asarray(target)
    a = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    stacked = segmentation_loss_fn(t, jnp.stack([a, b]))
    mean_single = 0.5 * (segmentation_loss_fn(t, a) + segmentation_loss_fn(t, b))
    np.testing.assert_allclose(float(stacked), float(mean_single), rtol=1e-6)


@pytest.mark.slow
def test_segnet_returns_percascade_stack_in_train_mode():
    cfg = {
        "model_name": "SEGNET",
        "num_cascades": 2,
        "channels": 4,
        "num_pools": 2,
        "segmentation_module_output_channels": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    b, c, h, w = 1, 2, 16, 16
    y = jnp.asarray(rng.standard_normal((b, c, h, w, 2)), jnp.float32)
    sens = jnp.asarray(rng.standard_normal((b, c, h, w, 2)), jnp.float32)
    mask = jnp.ones((b, 1, h, w), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    _, seg_eval = model.apply(variables, y, sens, mask, train=False)
    _, seg_train = model.apply(variables, y, sens, mask, train=True)
    assert seg_eval.ndim == 4
    assert seg_train.ndim == 5 and seg_train.shape[0] == 3  # 2 cascades + fused
    # the fused (last) stacked seg equals the eval output
    np.testing.assert_allclose(np.asarray(seg_train[-1]), np.asarray(seg_eval), rtol=1e-5, atol=1e-6)
    # and the trainer loss accepts the stack
    seg_t = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))]
    loss = segmentation_loss_fn(jnp.asarray(seg_t), seg_train)
    assert np.isfinite(float(loss))


# --------------------------------------------- quantitative loss golden parity


def _load_reference_quantitative_loss():
    """Exec the reference's own ``process_quantitative_loss`` (models fork,
    /root/reference/mridc/collections/quantitative/models/qcirim.py:343) in a
    minimal namespace; bind to a duck-typed self."""
    torch = pytest.importorskip("torch")
    src = open("/root/reference/mridc/collections/quantitative/models/qcirim.py").read()
    tree = ast.parse(src)
    fn_src = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "process_quantitative_loss":
            fn_src = ast.get_source_segment(src, node)
            break
    assert fn_src is not None
    ns = {"torch": torch}
    exec(textwrap.dedent(fn_src), ns)  # noqa: S102 — reference's own code, test-only
    return ns["process_quantitative_loss"], torch


@pytest.mark.parametrize("loss_type", ["l1", "mse"])
def test_quantitative_loss_matches_reference(loss_type):
    ref_fn, torch = _load_reference_quantitative_loss()
    rng = np.random.default_rng(42)
    C, T, B, H, W = 2, 3, 2, 12, 12
    target = rng.standard_normal((B, H, W, 4)).astype(np.float32) * np.array([40.0, 1.0, 100.0, 3.0], np.float32)
    preds = rng.standard_normal((C, T, B, H, W, 4)).astype(np.float32) * np.array([40.0, 1.0, 100.0, 3.0], np.float32)
    mask = (rng.random((B, H, W)) > 0.3).astype(np.float32)
    factors = {"R2star": 300.0, "S0": 500.0, "B0": 20000.0, "phi": 500.0}

    duck = types.SimpleNamespace(
        loss_regularization_factors=factors,
        accumulate_estimates=True,
        qcirim=[None] * C,
    )
    loss_fn = torch.nn.MSELoss() if loss_type == "mse" else torch.nn.L1Loss()
    names = ("R2star", "S0", "B0", "phi")
    ref_per_map = []
    for qi, name in enumerate(names):
        pred_list = [[torch.tensor(preds[c, t, ..., qi]) for t in range(T)] for c in range(C)]
        val = sum(ref_fn(duck, torch.tensor(target[..., qi]), pred_list, torch.tensor(mask), name, loss_fn))
        ref_per_map.append(float(val))
    ref_total = sum(ref_per_map) / 4.0 / 2.0

    total, per_map = quantitative_loss_fn(
        jnp.asarray(target),
        jnp.asarray(preds),
        jnp.asarray(mask),
        parse_loss_regularization_factors(factors),
        loss_type,
    )
    np.testing.assert_allclose(np.asarray(per_map), np.asarray(ref_per_map), rtol=2e-5)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-5)


def test_quantitative_loss_ssim_matches_reference():
    """SSIM branch vs the reference code, batch=1 (the reference's conv2d on
    [B, H, W] maps only runs unbatched, i.e. B=1)."""
    ref_fn, torch = _load_reference_quantitative_loss()
    import reference_loader

    ref_ssim_mod = reference_loader.load("mridc.collections.reconstruction.losses.ssim")
    rng = np.random.default_rng(7)
    C, T, B, H, W = 1, 2, 1, 16, 16
    target = np.abs(rng.standard_normal((B, H, W, 4))).astype(np.float32)
    preds = np.abs(rng.standard_normal((C, T, B, H, W, 4))).astype(np.float32)
    mask = np.ones((B, H, W), np.float32)
    factors = {"R2star": 3.0, "S0": 1.0, "B0": 1.0, "phi": 1.0}
    duck = types.SimpleNamespace(
        loss_regularization_factors=factors, accumulate_estimates=True, qcirim=[None] * C
    )
    loss_fn = ref_ssim_mod.SSIMLoss()
    names = ("R2star", "S0", "B0", "phi")
    ref_per_map = []
    for qi, name in enumerate(names):
        pred_list = [[torch.tensor(preds[c, t, ..., qi]) for t in range(T)] for c in range(C)]
        val = sum(ref_fn(duck, torch.tensor(target[..., qi]), pred_list, torch.tensor(mask), name, loss_fn))
        ref_per_map.append(float(val))
    ref_total = sum(ref_per_map) / 4.0 / 2.0

    total, per_map = quantitative_loss_fn(
        jnp.asarray(target),
        jnp.asarray(preds),
        jnp.asarray(mask),
        parse_loss_regularization_factors(factors),
        "ssim",
    )
    np.testing.assert_allclose(np.asarray(per_map), np.asarray(ref_per_map), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(total), ref_total, rtol=1e-4)


def test_parse_loss_regularization_factors_yaml_format():
    # the reference YAML format: list of single-key dicts
    f = parse_loss_regularization_factors([{"R2star": 3.0}, {"S0": 1.0}, {"B0": 2.0}, {"phi": 4.0}])
    np.testing.assert_allclose(np.asarray(f), [3.0, 1.0, 2.0, 4.0])
    np.testing.assert_allclose(np.asarray(parse_loss_regularization_factors(None)), [1.0] * 4)
    np.testing.assert_allclose(
        np.asarray(parse_loss_regularization_factors({"R2star": 2.0})), [2.0, 1.0, 1.0, 1.0]
    )


# ------------------------------------------------- val image logging + initial validate


class _FakeExp:
    def __init__(self):
        self.images = []
        self.scalars = []

    def log_image_triplet(self, tag, t, p, step):
        self.images.append(tag)

    def log_scalar(self, tag, value, step):
        self.scalars.append((tag, value, step))

    def on_validation_end(self, trainer, metrics, step):
        pass


@pytest.mark.slow
def test_validate_logs_image_triplets():
    from mridc_tpu.train.trainer import Trainer

    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    rng = np.random.default_rng(0)
    b, c, h, w = 2, 2, 16, 16
    batch = {
        "masked_kspace": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "sensitivity_maps": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "mask": np.ones((b, 1, h, w), np.float32),
        "target": rng.standard_normal((b, h, w, 2)).astype(np.float32),
    }
    exp = _FakeExp()
    trainer = Trainer(build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=exp)
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.validate([batch, batch])
    # 2 batches x 2 images each, within the default limit of 4 batches
    assert len(exp.images) == 4
    # disabled by log_images=False
    exp2 = _FakeExp()
    trainer2 = Trainer(build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-3},
                       exp_manager=exp2, log_images=False)
    trainer2.setup_optimization()
    trainer2.init_state(jax.random.PRNGKey(0), batch)
    trainer2.validate([batch])
    assert exp2.images == []


@pytest.mark.slow
def test_launch_runs_initial_validation(tmp_path, monkeypatch):
    """mode: train validates BEFORE fit (reference launch.py:136-138)."""
    from fixtures import create_dataset
    from mridc_tpu.launch import run_from_config
    from mridc_tpu.train.trainer import Trainer

    data = tmp_path / "data"
    data.mkdir()
    create_dataset(data, n_files=1, slices=2, coils=4, h=32, w=32)
    ds = {
        "data_path": str(data),
        "batch_size": 2,
        "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    cfg = {
        "mode": "train",
        "model": {
            "model_name": "UNet", "channels": 4, "pooling_layers": 2,
            "fft_centered": True, "fft_normalization": "ortho",
            "train_loss_fn": "l1", "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": ds, "validation_ds": dict(ds),
        },
        "trainer": {"max_epochs": 1, "max_steps": 2},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "iv"},
    }
    calls = []
    orig = Trainer.validate

    def spy(self, *a, **k):
        calls.append(int(self.state.step))
        return orig(self, *a, **k)

    monkeypatch.setattr(Trainer, "validate", spy)
    run_from_config(cfg)
    assert calls and calls[0] == 0  # first validate happened at step 0, before fit


def test_norm_by_max_signed():
    """Reference `x / torch.max(x)`: an all-negative map divides by its
    (negative) max — the round-2 clamp instead exploded it to ~1e12."""
    from mridc_tpu.models.multitask.models import _norm_by_max

    s = jnp.asarray([[-4.0, -2.0], [-8.0, -2.0]])
    out = np.asarray(_norm_by_max(s))
    np.testing.assert_allclose(out, np.asarray(s) / -2.0)  # sign flip, bounded
    assert np.abs(out).max() <= 4.0
    # zero map: guarded, stays zero
    np.testing.assert_allclose(np.asarray(_norm_by_max(jnp.zeros((2, 2)))), 0.0)


@pytest.mark.slow
def test_launch_train_mode_resumes(tmp_path):
    """resume_if_exists must restore the checkpoint BEFORE fit — a preempted
    run used to silently restart from random weights in the same run dir."""
    from fixtures import create_dataset
    from mridc_tpu.launch import run_from_config

    data = tmp_path / "data"
    data.mkdir()
    create_dataset(data, n_files=1, slices=2, coils=4, h=32, w=32)
    ds = {
        "data_path": str(data),
        "batch_size": 2,
        "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    cfg = {
        "mode": "train",
        "model": {
            "model_name": "UNet", "channels": 4, "pooling_layers": 2,
            "fft_centered": True, "fft_normalization": "ortho",
            "train_loss_fn": "l1", "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": ds,
        },
        "trainer": {"max_epochs": 2, "max_steps": 2},
        "exp_manager": {
            "exp_dir": str(tmp_path / "exp"), "name": "res",
            "resume_if_exists": True,
        },
    }
    trainer1, _ = run_from_config(cfg)
    assert int(trainer1.state.step) == 2
    trainer2, _ = run_from_config(dict(cfg))  # relaunch: must resume at step 2
    assert int(trainer2.state.step) >= 2


@pytest.mark.slow
def test_pretrained_install_does_not_alias_ema(tmp_path):
    """pretrained + EMA: ema_params must be a COPY of params — the donated
    train step rejects the same buffer donated twice."""
    from fixtures import create_dataset
    from mridc_tpu.launch import run_from_config
    from mridc_tpu.models import build_model as _bm

    data = tmp_path / "data"
    data.mkdir()
    create_dataset(data, n_files=1, slices=2, coils=4, h=32, w=32)
    model_cfg = {
        "model_name": "UNet", "channels": 4, "pooling_layers": 2,
        "fft_centered": True, "fft_normalization": "ortho",
    }
    # make a pretrained archive from a fresh init
    import jax.numpy as _jnp

    model = _bm(model_cfg)
    rng = np.random.default_rng(0)
    y = _jnp.asarray(np.stack([rng.standard_normal((1, 4, 32, 32)),
                               rng.standard_normal((1, 4, 32, 32))], -1).astype(np.float32))
    sens = y
    mask = _jnp.ones((1, 1, 32, 32), _jnp.float32)
    params = model.init(jax.random.PRNGKey(0), y, sens, mask)["params"]
    from mridc_tpu.train.checkpoints import save_archive

    ckpt = tmp_path / "m.mridc"
    save_archive(ckpt, model_cfg, params)
    ds = {
        "data_path": str(data), "batch_size": 2,
        "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
        "fft_centered": True, "fft_normalization": "ortho",
    }
    cfg = {
        "mode": "train", "pretrained": True, "checkpoint": str(ckpt),
        "model": {**model_cfg, "train_loss_fn": "l1",
                  "optim": {"name": "adam", "lr": 1e-3}, "train_ds": ds},
        "trainer": {"max_epochs": 1, "max_steps": 1},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "pe",
                        "ema": {"enable": True, "decay": 0.9}},
    }
    trainer, hist = run_from_config(cfg)  # crashes on aliased donation pre-fix
    assert np.isfinite(hist[-1]["train_loss"])


def test_seg_pred_classes_thresholds():
    """Reference validation binarization (segmentation/nn/base.py:355-361):
    per-class thresholds produce independent (possibly multi-hot) masks."""
    from mridc_tpu.train.task_trainers import _seg_pred_classes

    logits = np.asarray([[[[0.9, 0.6], [0.2, 0.7]]]], np.float32)  # [1,1,2,2]
    out = _seg_pred_classes(logits, [0.5, 0.5])
    np.testing.assert_array_equal(out, [[[[1.0, 1.0], [0.0, 1.0]]]])  # multi-hot allowed
    # None threshold falls back to 0.5 for that class
    out2 = _seg_pred_classes(logits, [None, 0.65])
    np.testing.assert_array_equal(out2, [[[[1.0, 0.0], [0.0, 1.0]]]])
    # without thresholds: one-hot argmax
    out3 = _seg_pred_classes(logits, None)
    assert np.all(out3.sum(-1) == 1.0)
