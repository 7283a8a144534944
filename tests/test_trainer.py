"""Trainer engine tests: optimizers, schedulers, a real multi-device DP fit on
the synthetic fixture, checkpoint/resume and archive roundtrip."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fixtures import create_dataset
from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
from mridc_tpu.data.subsample import create_masker
from mridc_tpu.data.transforms import MRIDataTransforms
from mridc_tpu.models import build_model
from mridc_tpu.parallel.mesh import make_mesh
from mridc_tpu.train.checkpoints import load_archive, restore_model, save_archive
from mridc_tpu.train.config import apply_overrides, load_config, save_config
from mridc_tpu.train.optim import AVAILABLE_OPTIMIZERS, get_optimizer
from mridc_tpu.train.schedulers import (
    AVAILABLE_SCHEDULERS,
    compute_max_steps,
    get_scheduler,
)
from mridc_tpu.train.trainer import Trainer


def test_all_optimizers_build_and_step():
    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.ones((4, 4))}
    for name in AVAILABLE_OPTIMIZERS:
        tx = get_optimizer(name, 1e-3)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        assert jnp.isfinite(updates["w"]).all(), name


@pytest.mark.parametrize("name", [n for n in AVAILABLE_SCHEDULERS if n != "ReduceLROnPlateau"])
def test_schedulers_produce_sane_lrs(name):
    kwargs = {"max_steps": 100, "warmup_steps": 10}
    if name == "NoamAnnealing":
        kwargs["d_model"] = 64
    sched = get_scheduler(name, 1e-3, **kwargs)
    lrs = np.array([float(sched(s)) for s in range(0, 120, 5)])
    assert np.isfinite(lrs).all()
    assert (lrs >= 0).all()
    if name != "T5InverseSquareRootAnnealing":  # reference formula is lr-independent 1/sqrt(step)
        assert lrs.max() <= 1e-2 + 1e-8


def test_warmup_and_decay_shape():
    sched = get_scheduler("CosineAnnealing", 1e-3, max_steps=100, warmup_steps=10, min_lr=1e-6)
    assert float(sched(0)) < float(sched(9))  # warming up
    assert float(sched(50)) > float(sched(99))  # decaying
    assert float(sched(110)) == pytest.approx(1e-6)


def test_compute_max_steps():
    # 100 samples, batch 10, 5 epochs -> 50 steps
    assert compute_max_steps(5, 1, 1.0, 0, 100, 10, False) == 50
    assert compute_max_steps(5, 2, 1.0, 0, 100, 10, False) == 25


def test_config_overrides(tmp_path):
    cfg = {"model": {"lr": 1.0, "nested": {"a": 1}}, "mode": "train"}
    save_config(cfg, tmp_path / "c.yaml")
    loaded = load_config(tmp_path / "c.yaml", overrides=["model.lr=1e-3", "model.nested.a=7", "mode=test"])
    assert loaded["model"]["lr"] == 1e-3
    assert loaded["model"]["nested"]["a"] == 7
    assert loaded["mode"] == "test"
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["notanoverride"])


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    create_dataset(root, n_files=2, slices=4, coils=4, h=32, w=32)
    tfm = MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.16], [3])],
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
    )
    ds = ReconstructionMRIDataset(root=root, transform=tfm)
    train = BatchLoader(ds, batch_size=8, shuffle=True, seed=0)
    val = BatchLoader(ds, batch_size=8)
    return train, val


def test_fit_unet_multidevice_loss_decreases(loaders, tmp_path):
    train, val = loaders
    cfg = {
        "model_name": "UNet",
        "channels": 8,
        "pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.shape["data"] == 8
    trainer = Trainer(
        model,
        optim_cfg={"name": "adam", "lr": 3e-3},
        trainer_cfg={"max_epochs": 6},
        loss_type="l1",
        mesh=mesh,
    )
    history = trainer.fit(train, val_loader=val, max_epochs=6, log_every_n_steps=100)
    first, last = history[0], history[-1]
    assert last["train_loss"] < first["train_loss"]
    assert "val_SSIM" in last and 0 <= last["val_SSIM"] <= 1


def test_cirim_trains_and_ssdu_mask_path(loaders):
    train, _ = loaders
    cfg = {
        "model_name": "CIRIM",
        "num_cascades": 1,
        "time_steps": 8,
        "conv_filters": [8, 8, 2],
        "recurrent_filters": [8, 8, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, loss_type="l1")
    batch = next(iter(train))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    m1 = trainer.training_batch(batch)
    m2 = trainer.training_batch(batch)
    assert float(m2["loss"]) < float(m1["loss"]) * 1.5  # finite and sane
    assert np.isfinite(float(m1["grad_norm"]))


def test_archive_roundtrip(tmp_path, loaders):
    train, _ = loaders
    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = build_model(cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3})
    batch = next(iter(train))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    path = save_archive(tmp_path / "model.mridc", cfg, trainer.state.params)
    rcfg, _ = load_archive(path)
    assert rcfg["model_name"] == "UNet"
    model2, params2, cfg2 = restore_model(path)
    y, sens, mask, init_pred = Trainer._model_inputs(batch)
    out1 = model.apply({"params": trainer.state.params}, y, sens, mask, init_pred)
    out2 = model2.apply({"params": params2}, y, sens, mask, init_pred)
    np.testing.assert_allclose(np.asarray(out1.prediction), np.asarray(out2.prediction), rtol=1e-6)


def test_gradient_accumulation(loaders):
    train, _ = loaders
    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = build_model(cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3},
                      trainer_cfg={"accumulate_grad_batches": 2})
    batch = next(iter(train))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    trainer.training_batch(batch)  # accumulating: params unchanged
    p1 = jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    np.testing.assert_allclose(p0, p1)
    trainer.training_batch(batch)  # second micro-batch applies the update
    p2 = jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    assert np.abs(p2 - p0).max() > 0


def test_ema_params_track_weights(loaders):
    """EMA pytree average (reference common/callbacks/ema.py:19)."""
    train, _ = loaders
    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = build_model(cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-2},
                      use_ema=True, ema_decay=0.5)
    batch = next(iter(train))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.training_batch(batch)
    trainer.training_batch(batch)
    p = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))[0]
    e = jax.tree_util.tree_leaves(jax.device_get(trainer.state.ema_params))[0]
    assert np.abs(p - e).max() > 0      # EMA lags the live params
    assert np.isfinite(e).all()
    # eval can run on the averaged weights
    pred = trainer.predict_batch(batch, use_ema=True)
    assert np.isfinite(pred).all()


def test_validate_uses_ema_weights_when_enabled(loaders):
    """With EMA on, validate/test evaluate the averaged weights (reference EMA
    callback swaps them in for val/test, common/callbacks/ema.py:19)."""
    train, val = loaders
    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = build_model(cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-2},
                      use_ema=True, ema_decay=0.5)
    batch = next(iter(train))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.training_batch(batch)
    # zero out the EMA weights: if validate really evaluates them, its numbers
    # must differ from a raw-weight validation
    trainer.state = trainer.state.replace(
        ema_params=jax.tree_util.tree_map(jnp.zeros_like, trainer.state.ema_params)
    )
    with_ema = trainer.validate(val)
    without_ema = trainer.validate(val, use_ema=False)
    assert with_ema["val_loss"] != without_ema["val_loss"]


def test_sigterm_preemption_checkpoint(loaders, tmp_path):
    """SIGTERM mid-fit saves a resumable checkpoint (TPU preemption story;
    reference analog: exp_manager resume_if_exists, exp_manager.py:401-471)."""
    import os
    import signal as _signal
    import threading

    from mridc_tpu.train.exp_manager import ExpManager

    train, _ = loaders
    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = build_model(cfg)
    exp = ExpManager(exp_dir=str(tmp_path / "exp"), name="preempt", version="v1", model_config=cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=exp)
    # warm the jit outside fit so the handler is installed long before the
    # signal lands (SIGTERM before installation would kill pytest itself)
    batch = next(iter(train))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.training_batch(batch)
    timer = threading.Timer(1.0, lambda: os.kill(os.getpid(), _signal.SIGTERM))
    timer.start()
    try:
        trainer.fit(train, max_epochs=100000, log_every_n_steps=100000)
    finally:
        timer.cancel()
    ckpts = list((tmp_path / "exp" / "preempt" / "v1" / "checkpoints").glob("*"))
    assert ckpts, "no checkpoint written on SIGTERM"
    # a fresh trainer resumes from it
    exp2 = ExpManager(exp_dir=str(tmp_path / "exp"), name="preempt", version="v1",
                      resume_if_exists=True, model_config=cfg)
    trainer2 = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=exp2)
    batch = next(iter(train))
    trainer2.setup_optimization()
    trainer2.init_state(jax.random.PRNGKey(1), batch)
    assert exp2.maybe_resume(trainer2)
    assert int(trainer2.state.step) > 0


def test_profiler_trace_capture(loaders, tmp_path):
    """trainer.profile_dir writes a TB-readable XPlane trace of a step window."""
    train, _ = loaders
    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = build_model(cfg)
    pdir = tmp_path / "prof"
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3},
                      trainer_cfg={"profile_dir": str(pdir), "profile_start_step": 1,
                                   "profile_steps": 1})
    trainer.fit(train, max_epochs=4, log_every_n_steps=1000)
    traces = list(pdir.rglob("*.xplane.pb"))
    assert traces, f"no xplane trace under {pdir}"


def test_trainer_ptl_knobs(tmp_path, loaders):
    """limit_train/val_batches, check_val_every_n_epoch, num_sanity_val_steps,
    val_check_interval, log_every_n_steps from the trainer config (reference
    TrainerConfig semantics, core/conf/trainer.py)."""
    import jax

    from mridc_tpu.train.trainer import Trainer, _limit_batches

    # _limit_batches semantics
    class L(list):
        pass

    loader = L(range(10))
    assert _limit_batches(1.0, loader) is None
    assert _limit_batches(0.25, loader) == 3
    assert _limit_batches(4, loader) == 4
    assert _limit_batches(None, loader) is None

    cfg = {
        "model_name": "UNet",
        "channels": 4,
        "pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)

    calls = {"val": 0}
    orig_validate = Trainer.validate

    def counting_validate(self, vl, use_ema=None, limit=None):
        calls["val"] += 1
        calls["last_limit"] = limit
        return orig_validate(self, vl, use_ema=use_ema, limit=limit)

    Trainer.validate = counting_validate
    try:
        trainer = Trainer(
            model,
            optim_cfg={"name": "adam", "lr": 1e-3},
            trainer_cfg={
                "max_epochs": 2,
                "limit_train_batches": 1,
                "limit_val_batches": 1,
                "check_val_every_n_epoch": 2,
                "num_sanity_val_steps": 1,
                "log_every_n_steps": 1,
            },
        )
        train_loader, val_loader = loaders
        history = trainer.fit(train_loader, val_loader, max_epochs=2)
    finally:
        Trainer.validate = orig_validate
    # sanity (1) + epoch-2 validation (1); epoch 1 skipped by check_val_every
    assert calls["val"] == 2
    assert calls["last_limit"] == 1
    # limit_train_batches=1: only one optimizer step per epoch
    assert int(trainer.state.step) == 2
    assert "val_loss" in history[-1]
    assert "val_loss" not in history[0]


def test_plateau_scheduler_survives_step_rebuild():
    """An LR drop re-traces the jitted step via setup_optimization; the live
    plateau (reduced lr + patience state) must survive the rebuild."""
    from mridc_tpu.models import build_model
    from mridc_tpu.train.trainer import Trainer

    trainer = Trainer(
        build_model({"model_name": "UNet", "channels": 4, "pooling_layers": 2}),
        optim_cfg={"name": "adam", "lr": 1e-3, "sched": {"name": "ReduceLROnPlateau", "factor": 0.5, "patience": 0}},
    )
    trainer.setup_optimization()
    plateau = trainer.plateau
    assert plateau is not None
    plateau.update(1.0)
    plateau.update(1.0)  # patience 0: second non-improving step halves lr
    reduced = plateau.lr
    assert reduced < 1e-3
    trainer.setup_optimization()  # the post-drop rebuild
    assert trainer.plateau is plateau
    assert trainer.plateau.lr == reduced


def test_max_steps_zero_and_accumulation_scaling(loaders):
    """max_steps=0 runs no training steps; with accumulate_grad_batches the
    limit counts optimizer steps (PTL semantics)."""
    from mridc_tpu.models import build_model
    from mridc_tpu.train.trainer import Trainer

    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    train_loader, _ = loaders
    t0 = Trainer(build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-3},
                 trainer_cfg={"max_epochs": 2, "max_steps": 0})
    t0.fit(train_loader, max_epochs=2)
    assert int(t0.state.step) == 0

    t1 = Trainer(build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-3},
                 trainer_cfg={"max_epochs": 8, "max_steps": 1, "accumulate_grad_batches": 2})
    t1.fit(train_loader, max_epochs=8)
    # 1 optimizer step x accumulation 2 = 2 micro-steps
    assert int(t1.state.step) == 2


def test_model_inputs_fold_consecutive_slices():
    """[B, S, C, H, W, 2] batches fold S into batch for every model input."""
    from mridc_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    B, S, C, H, W = 2, 3, 4, 8, 8
    batch = {
        "masked_kspace": rng.standard_normal((B, S, C, H, W, 2)).astype(np.float32),
        "sensitivity_maps": rng.standard_normal((B, S, C, H, W, 2)).astype(np.float32),
        "mask": np.ones((B, 1, H, W), np.float32),
        "initial_prediction": rng.standard_normal((B, S, H, W, 2)).astype(np.float32),
    }
    y, sens, mask, init_pred = Trainer._model_inputs(batch)
    assert y.shape == (B * S, C, H, W, 2)
    assert sens.shape == (B * S, C, H, W, 2)
    assert mask.shape == (B * S, 1, H, W)
    assert init_pred.shape == (B * S, H, W, 2)
