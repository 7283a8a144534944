"""End-to-end CLI runs for segmentation and multitask tasks on the fixture."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest
import yaml

from fixtures import create_dataset
from mridc_tpu.launch import model_task, run_from_config


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("seg_data")
    create_dataset(root, n_files=1, slices=2, coils=3, h=32, w=32, with_segmentation=True)
    return root


def test_model_task_dispatch():
    assert model_task("CIRIM") == "reconstruction"
    assert model_task("SegmentationUNet") == "segmentation"
    assert model_task("MTLRS") == "multitask"
    assert model_task("qCIRIM") == "quantitative"


def test_run_segmentation_from_config(tmp_path, seg_data):
    cfg = {
        "mode": "train",
        "model": {
            "model_name": "SegmentationUNet",
            "segmentation_module_output_channels": 2,
            "segmentation_module_channels": 4,
            "segmentation_module_pooling_layers": 2,
            "magnitude_input": True,
            "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": {"data_path": str(seg_data), "batch_size": 2, "fft_centered": True,
                         "fft_normalization": "ortho", "coil_combination_method": "RSS"},
            "validation_ds": {"data_path": str(seg_data), "batch_size": 2, "fft_centered": True,
                              "fft_normalization": "ortho", "coil_combination_method": "RSS"},
        },
        "trainer": {"max_epochs": 1},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "seg"},
    }
    trainer, history = run_from_config(cfg)
    assert np.isfinite(history[-1]["train_loss"])
    assert "val_DICE" in history[-1]


def test_run_multitask_from_config(tmp_path, seg_data):
    cfg = {
        "mode": "train",
        "model": {
            "model_name": "RECSEGNET",
            "reconstruction_module_channels": 4,
            "reconstruction_module_pooling_layers": 2,
            "segmentation_module_channels": 4,
            "segmentation_module_pooling_layers": 2,
            "segmentation_module_output_channels": 2,
            "fft_centered": True,
            "fft_normalization": "ortho",
            "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": {
                "data_path": str(seg_data), "batch_size": 2,
                "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
                "fft_centered": True, "fft_normalization": "ortho",
            },
        },
        "trainer": {"max_epochs": 1},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "mt"},
    }
    trainer, history = run_from_config(cfg)
    assert np.isfinite(history[-1]["train_loss"])


def test_run_quantitative_from_config(tmp_path, tmp_path_factory):
    from fixtures import create_qmri_dataset

    qroot = tmp_path_factory.mktemp("q_data")
    create_qmri_dataset(qroot, n_files=1, slices=2, echoes=4, coils=2, h=16, w=16)
    cfg = {
        "mode": "train",
        "model": {
            "model_name": "qVN",
        "quantitative_module_gamma_regularization_factors": [1.0, 1.0, 1.0, 1.0],
            "quantitative_module_num_cascades": 1,
            "quantitative_module_channels": 4,
            "quantitative_module_pooling_layers": 2,
            "TEs": [3.0, 11.5, 20.0, 28.5],
            "fft_centered": True,
            "fft_normalization": "ortho",
            "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": {"data_path": str(qroot), "batch_size": 2},
        },
        "trainer": {"max_epochs": 1},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "q"},
    }
    trainer, history = run_from_config(cfg)
    assert np.isfinite(history[-1]["train_loss"])


def test_run_segmentation_bf16_from_config(tmp_path, seg_data):
    """The compute_dtype knob flows through the FULL launch path (YAML config
    -> schema -> trainer -> jitted train step): one bf16 training epoch on
    the fixture converges to a finite loss and produces validation metrics."""
    cfg = {
        "mode": "train",
        "model": {
            "model_name": "SegmentationUNet",
            "compute_dtype": "bfloat16",
            "segmentation_module_output_channels": 2,
            "segmentation_module_channels": 4,
            "segmentation_module_pooling_layers": 2,
            "magnitude_input": True,
            "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": {"data_path": str(seg_data), "batch_size": 2, "fft_centered": True,
                         "fft_normalization": "ortho", "coil_combination_method": "RSS"},
            "validation_ds": {"data_path": str(seg_data), "batch_size": 2, "fft_centered": True,
                              "fft_normalization": "ortho", "coil_combination_method": "RSS"},
        },
        "trainer": {"max_epochs": 1},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "seg_bf16"},
    }
    trainer, history = run_from_config(cfg)
    assert np.isfinite(history[-1]["train_loss"])
    assert "val_DICE" in history[-1]
