"""Regression tests for the round-4 review findings (code-review sweep over
8b1eba1..HEAD): mask-RNG thread race, live-BN archive restore, prefetcher
sentinel starvation, early-break determinism, form knob validity, quantitative
val lossrecon, QBatchLoader target gating."""

import queue
import threading
import time

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402


def test_mask_rng_thread_safety():
    """Concurrent seeded mask draws must equal the single-threaded draws —
    temp_seed's seed/draw/restore on the shared RandomState is now atomic."""
    from mridc_tpu.data.subsample import create_masker

    masker = create_masker("random1d", [0.08], [4])
    shape = (1, 64, 64, 2)
    seeds = [tuple(map(ord, f"file{i}.h5")) for i in range(32)]
    want = {s: masker(np.array(shape), s)[0] for s in seeds}

    results = {}
    errors = []

    def work(seed):
        try:
            for _ in range(20):
                m, _ = masker(np.array(shape), seed)
                np.testing.assert_array_equal(m, want[seed])
            results[seed] = True
        except Exception as e:  # noqa: BLE001
            errors.append((seed, e))

    threads = [threading.Thread(target=work, args=(s,)) for s in seeds]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
    assert len(results) == len(seeds)


def test_live_bn_archive_restore_roundtrip(tmp_path):
    """restore_model unwraps live-BN archives to bare params;
    restore_model_variables returns the stats (review finding #2)."""
    from mridc_tpu.models import build_model
    from mridc_tpu.train.checkpoints import restore_model, restore_model_variables, save_archive

    cfg = {"model_name": "SEGMENTATIONVNET", "segmentation_module_output_channels": 2,
           "train_batch_stats": True}
    model = build_model(cfg)
    x = jnp.ones((1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    p = tmp_path / "m.mridc"
    save_archive(p, cfg, variables["params"], batch_stats=variables["batch_stats"])

    m2, params, _ = restore_model(p)
    # the restored params must drive an eval apply together with the stats
    m3, vars3, _ = restore_model_variables(p)
    assert set(vars3) == {"params", "batch_stats"}
    out = m3.apply({"params": params, "batch_stats": vars3["batch_stats"]}, x, train=False)
    assert np.isfinite(np.asarray(out)).all()

    # plain archives keep the old contract
    cfg2 = {"model_name": "ZF"}
    save_archive(tmp_path / "z.mridc", cfg2, {"w": np.ones(2, np.float32)})
    _, p2, _ = restore_model(tmp_path / "z.mridc")
    assert set(p2) == {"w"}


def test_prefetcher_terminal_items_survive_slow_consumer():
    """A producer exception (or end) while the queue is full must still reach
    the consumer — the old 5s-timeout put dropped it and the consumer hung."""
    from mridc_tpu.data.prefetch import Prefetcher

    class Boom:
        def __iter__(self):
            yield 0
            yield 1
            raise RuntimeError("late failure")

    it = iter(Prefetcher(Boom(), depth=1))
    assert next(it) == 0
    time.sleep(0.5)  # producer now blocks on a full queue holding the error path
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="late failure"):
        next(it)


def test_early_break_does_not_desync_later_epochs(tmp_path):
    """limit_*-style early breaks with prefetch running ahead must not change
    later epochs' acceleration draws (per-sample seeded RNG)."""
    from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
    from mridc_tpu.data.prefetch import Prefetcher
    from mridc_tpu.data.subsample import create_masker
    from mridc_tpu.data.transforms import MRIDataTransforms

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import create_dataset

    root = tmp_path / "ds"
    create_dataset(root, n_files=2, slices=3, coils=3, h=32, w=32)
    tfm = MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.08], [a]) for a in (4, 8)],
        fft_centered=True, fft_normalization="ortho", coil_combination_method="SENSE",
    )

    def make(prefetch):
        ds = ReconstructionMRIDataset(root=root, transform=tfm)
        loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=3)
        return Prefetcher(loader, depth=3) if prefetch else loader

    def run(loader, break_first_epoch_at):
        accs = []
        for i, b in enumerate(loader):  # epoch 1: break early
            if i >= break_first_epoch_at:
                break
        for b in loader:  # epoch 2: full
            accs.extend(np.asarray(b["acceleration"]).tolist())
        return accs

    sync = run(make(False), 1)
    pre = run(make(True), 1)
    assert sync == pre
    assert len(set(sync)) > 1  # multiple accelerations actually drawn


def test_form_knob_choices_are_valid():
    """Every choice the form offers must pass the validators (review: the old
    lists offered invalid 'both'/'mean_std' and hid valid values)."""
    from mridc_tpu.app.forms import _choices_for
    from mridc_tpu.models import build_model

    for mode in _choices_for("model.remat_mode"):
        build_model({"model_name": "CIRIM", "conv_filters": [4, 4, 2],
                     "recurrent_filters": [4, 4, 0], "num_cascades": 1,
                     "time_steps": 2, "remat_mode": mode})
    assert "step+cascade" in _choices_for("model.remat_mode")

    from mridc_tpu.data.transforms import MRIDataTransforms

    for nt in _choices_for("model.train_ds.normalization_type"):
        MRIDataTransforms(normalization_type=nt)  # raises on unknown values
    assert "mean" in _choices_for("model.train_ds.normalization_type")


def test_qbatchloader_target_gated(tmp_path):
    import h5py

    from mridc_tpu.data.seg_pipeline import QBatchLoader
    from mridc_tpu.data.task_loaders import qMRIDataset

    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "q.h5", "w") as f:
        f["kspace"] = (rng.standard_normal((2, 2, 2, 16, 16))
                       + 1j * rng.standard_normal((2, 2, 2, 16, 16))).astype(np.complex64)
    ds = qMRIDataset(root=tmp_path)
    off = next(iter(QBatchLoader(ds, tes=[3.0, 11.5], batch_size=2)))
    assert "target" not in off
    on = next(iter(QBatchLoader(ds, tes=[3.0, 11.5], batch_size=2, compute_target=True)))
    assert on["target"].shape == (2, 2, 16, 16, 2)


def test_quantitative_val_loss_includes_lossrecon():
    """Reference adds lossrecon to val_loss (quantitative/models/base.py:618)."""
    from mridc_tpu.models import build_model
    from mridc_tpu.train.task_trainers import QuantitativeTrainer

    rng = np.random.default_rng(7)
    B, E, C, H, W = 1, 2, 2, 16, 16

    def rv(s):
        return np.stack([rng.standard_normal(s), rng.standard_normal(s)], -1).astype(np.float32)

    cfg = {
        "model_name": "QCIRIM",
        "use_reconstruction_module": True,
        "reconstruction_module_num_cascades": 1,
        "reconstruction_module_time_steps": 2,
        "reconstruction_module_conv_filters": [4, 4, 2],
        "reconstruction_module_recurrent_filters": [4, 4, 0],
        "quantitative_module_num_cascades": 1,
        "quantitative_module_time_steps": 2,
        "quantitative_module_conv_filters": [4, 4, 4],
        "quantitative_module_recurrent_filters": [4, 4, 0],
        "fft_centered": False,
        "fft_normalization": "backward",
    }
    model = build_model(cfg)
    sens = rv((B, C, H, W))
    sens /= np.sqrt((sens**2).sum(axis=(1, -1), keepdims=True))
    batch = {
        "kspace": rv((B, E, C, H, W)),
        "sensitivity_maps": sens,
        "mask": np.ones((B, 1, H, W), np.float32),
        "maps_init": rng.random((B, H, W, 4)).astype(np.float32),
        "maps_target": rng.random((B, H, W, 4)).astype(np.float32),
        "mask_brain": np.ones((B, H, W), np.float32),
        "TEs": np.asarray([3.0, 11.5], np.float32),
        "target": rv((B, E, H, W)),
    }
    trainer = QuantitativeTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, loss_type="l1")
    trainer.init_state(jax.random.PRNGKey(0), batch)
    with_recon = trainer.validate([batch])["val_loss"]
    no_target = {k: v for k, v in batch.items() if k != "target"}
    without = trainer.validate([no_target])["val_loss"]
    assert with_recon > without  # lossrecon term present and positive


def test_mtlrs_live_bn_seg_module():
    """MTLRS with a BN-bearing seg module (vnet) honors train_batch_stats
    through the MultitaskTrainer: stats are captured, tracked, and consumed
    at eval."""
    from mridc_tpu.models import build_model
    from mridc_tpu.train.task_trainers import MultitaskTrainer

    rng = np.random.default_rng(0)
    b, c, h, w = 2, 2, 16, 16
    cfg = {
        "model_name": "MTLRS",
        "joint_reconstruction_segmentation_module_cascades": 1,
        "reconstruction_module_num_cascades": 1,
        "reconstruction_module_time_steps": 2,
        "reconstruction_module_conv_filters": [4, 4, 2],
        "reconstruction_module_recurrent_filters": [4, 4, 0],
        "segmentation_module": "vnet",
        "segmentation_module_output_channels": 2,
        "segmentation_module_input_channels": 2,
        "train_batch_stats": True,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
    trainer = MultitaskTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3})
    sens = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
    sens /= np.sqrt((sens**2).sum(axis=(1, -1), keepdims=True))
    batch = {
        "masked_kspace": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "sensitivity_maps": sens,
        "mask": np.ones((b, 1, h, w, 1), np.float32),
        "target": rng.standard_normal((b, h, w, 2)).astype(np.float32),
        "segmentation": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))],
    }
    trainer.init_state(jax.random.PRNGKey(0), trainer._device_batch(batch))
    assert trainer.state.batch_stats is not None
    init_bs = jax.tree_util.tree_map(np.asarray, trainer.state.batch_stats)
    for _ in range(2):
        m = trainer.training_batch(batch)
        assert np.isfinite(float(m["loss"]))
    moved = jax.tree_util.tree_map(lambda a, b2: float(np.abs(a - b2).max()),
                                   init_bs, jax.tree_util.tree_map(np.asarray, trainer.state.batch_stats))
    assert max(jax.tree_util.tree_leaves(moved)) > 1e-4
    pred, seg = trainer.predict_batch(batch)
    assert np.isfinite(pred).all() and np.isfinite(seg).all()
