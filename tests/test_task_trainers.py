"""Segmentation and multitask trainer end-to-end tests on synthetic data."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from mridc_tpu.metrics.segmentation import (
    SegmentationMetrics,
    binary_dice,
    binary_iou,
    hausdorff_distance_95,
)
from mridc_tpu.models import build_model
from mridc_tpu.train.task_trainers import MultitaskTrainer, SegmentationTrainer


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches
        self.dataset = list(range(len(batches)))
        self.batch_size = batches[0]["image"].shape[0] if "image" in batches[0] else batches[0]["target"].shape[0]

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _seg_batches(n=2, b=4, h=32, w=32, cls=3, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n):
        # blobs: class = quadrant
        labels = np.zeros((b, h, w), np.int64)
        labels[:, : h // 2, : w // 2] = 1
        labels[:, h // 2 :, w // 2 :] = 2
        seg = np.eye(cls, dtype=np.float32)[labels]
        image = seg @ np.array([[0.1], [0.6], [1.0]], np.float32)  # class-dependent intensity
        image = image + 0.05 * rng.standard_normal(image.shape).astype(np.float32)
        batches.append({"image": image, "segmentation": seg})
    return batches


def test_segmentation_trainer_learns():
    cfg = {
        "model_name": "SegmentationUNet",
        "segmentation_module_output_channels": 3,
        "segmentation_module_channels": 8,
        "segmentation_module_pooling_layers": 2,
    }
    model = build_model(cfg)
    trainer = SegmentationTrainer(model, optim_cfg={"name": "adam", "lr": 3e-3})
    batches = _seg_batches()
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batches[0])
    losses = []
    for _ in range(12):
        for b in batches:
            losses.append(float(trainer.training_batch(b)["loss"]))
    assert losses[-1] < losses[0]
    val = trainer.validate(_ListLoader(batches))
    assert val["val_DICE"] > 0.5


def test_multitask_trainer_step():
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
    model = build_model(cfg)
    trainer = MultitaskTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3})
    rng = np.random.default_rng(0)
    b, c, h, w = 2, 2, 32, 32
    batch = {
        "masked_kspace": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "sensitivity_maps": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "mask": np.ones((b, 1, h, w), np.float32),
        "initial_prediction": rng.standard_normal((b, h, w, 2)).astype(np.float32),
        "target": rng.standard_normal((b, h, w, 2)).astype(np.float32),
        "segmentation": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))],
    }
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    m1 = trainer.training_batch(batch)
    m2 = trainer.training_batch(batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m1["seg_loss"]) > 0


def test_segmentation_metric_functions():
    t = np.zeros((16, 16), bool)
    t[4:12, 4:12] = True
    p = np.zeros((16, 16), bool)
    p[5:13, 5:13] = True
    assert 0.5 < binary_dice(t, p) < 1.0
    assert 0.4 < binary_iou(t, p) < 1.0
    assert binary_dice(t, t) > 0.999
    assert hausdorff_distance_95(t, p) <= 2.0
    m = SegmentationMetrics(include_background=False)
    target = np.stack([~t, t])
    pred = np.stack([~p, p])
    out = m(target, pred)
    assert out["DICE"] > 0.5 and out["HD95"] <= 2.0


def test_quantitative_trainer_step():
    from mridc_tpu.train.task_trainers import QuantitativeTrainer

    cfg = {
        "model_name": "qVN",
        "quantitative_module_gamma_regularization_factors": [1.0, 1.0, 1.0, 1.0],
        "quantitative_module_num_cascades": 1,
        "quantitative_module_channels": 4,
        "quantitative_module_pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
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
    trainer = QuantitativeTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3})
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    m1 = trainer.training_batch(batch)
    m2 = trainer.training_batch(batch)
    assert np.isfinite(float(m1["loss"])) and float(m2["loss"]) <= float(m1["loss"]) * 1.5


def test_quantitative_trainer_validate():
    """QuantitativeTrainer.validate: per-map NMSE on quantitative batches."""
    from mridc_tpu.train.task_trainers import QuantitativeTrainer

    cfg = {
        "model_name": "QCIRIM",
        "quantitative_module_num_cascades": 1,
        "quantitative_module_time_steps": 2,
        "quantitative_module_conv_filters": [4, 4, 4],
        "quantitative_module_recurrent_filters": [4, 4, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    rng = np.random.default_rng(3)
    b, e, c, h, w = 1, 4, 2, 16, 16
    batch = {
        "kspace": rng.standard_normal((b, e, c, h, w, 2)).astype(np.float32),
        "sensitivity_maps": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "mask": np.ones((b, 1, h, w), np.float32),
        "maps_init": np.abs(rng.standard_normal((b, h, w, 4))).astype(np.float32),
        "maps_target": np.abs(rng.standard_normal((b, h, w, 4))).astype(np.float32),
        "TEs": np.asarray([3.0, 11.5, 20.0, 28.5], np.float32),
    }
    trainer = QuantitativeTrainer(
        build_model(cfg), optim_cfg={"name": "adam", "lr": 1e-3}, trainer_cfg={"max_epochs": 1}
    )
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    out = trainer.validate([batch, batch], limit=1)
    assert "val_loss" in out and np.isfinite(out["val_loss"])
    assert "val_NMSE_R2star" in out and np.isfinite(out["val_NMSE_R2star"])
