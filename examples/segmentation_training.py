"""Example: train a segmentation model (AttentionUNet) on synthetic data.

Creates a mock image+label dataset, trains for a few epochs via the launcher
(same YAML schema as the reference's segmentation configs), and reports Dice.

Run:  python examples/segmentation_training.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from fixtures import create_dataset  # noqa: E402

from mridc_tpu.launch import run_from_config  # noqa: E402


def main():
    tmp = Path(tempfile.mkdtemp(prefix="mridc_tpu_seg_"))
    data = tmp / "data"
    create_dataset(data, n_files=2, slices=4, coils=3, h=32, w=32, with_segmentation=True)

    cfg = {
        "mode": "train",
        "model": {
            "model_name": "SEGMENTATIONATTENTIONUNET",
            "segmentation_module_input_channels": 1,
            "segmentation_module_output_channels": 2,
            "segmentation_module_channels": 8,
            "segmentation_module_pooling_layers": 2,
            "magnitude_input": True,
            "optim": {"name": "adam", "lr": 1e-3},
            "train_ds": {"data_path": str(data), "batch_size": 4, "fft_centered": True,
                         "fft_normalization": "ortho", "coil_combination_method": "RSS"},
            "validation_ds": {"data_path": str(data), "batch_size": 4, "fft_centered": True,
                              "fft_normalization": "ortho", "coil_combination_method": "RSS"},
        },
        "trainer": {"max_epochs": 2},
        "exp_manager": {"exp_dir": str(tmp / "exp"), "name": "seg_example"},
    }
    trainer, history = run_from_config(cfg)
    print("history:", history)


if __name__ == "__main__":
    main()
