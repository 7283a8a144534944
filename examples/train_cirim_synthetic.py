"""End-to-end example: train CIRIM on a synthetic phantom dataset.

Creates a mock fastMRI-style h5 dataset, trains for a few epochs with
data-parallel sharding over all local devices, evaluates, and dumps
reconstructions — the whole framework in ~40 lines.

Run:  python examples/train_cirim_synthetic.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo checkout without install
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from fixtures import create_dataset  # noqa: E402

from mridc_tpu.launch import run_from_config  # noqa: E402


def main():
    tmp = Path(tempfile.mkdtemp(prefix="mridc_tpu_example_"))
    data = tmp / "data"
    create_dataset(data, n_files=2, slices=4, coils=4, h=64, w=64)

    cfg = {
        "mode": "train",
        "model": {
            "model_name": "CIRIM",
            "num_cascades": 2,
            "time_steps": 8,
            "conv_filters": [32, 32, 2],
            "recurrent_filters": [32, 32, 0],
            "fft_centered": True,
            "fft_normalization": "ortho",
            "train_loss_fn": "l1",
            "optim": {
                "name": "adam",
                "lr": 1e-3,
                "sched": {"name": "CosineAnnealing", "warmup_steps": 4, "min_lr": 1e-6},
            },
            "train_ds": {
                "data_path": str(data),
                "batch_size": 4,
                "shuffle": True,
                "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
                "fft_centered": True,
                "fft_normalization": "ortho",
            },
            "validation_ds": {
                "data_path": str(data),
                "batch_size": 4,
                "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
                "fft_centered": True,
                "fft_normalization": "ortho",
            },
        },
        "trainer": {"max_epochs": 3},
        "exp_manager": {"exp_dir": str(tmp / "exp"), "name": "cirim_example"},
    }
    trainer, history = run_from_config(cfg)
    print("\nfinal epoch:", {k: round(v, 4) for k, v in history[-1].items() if isinstance(v, float)})
    print("artifacts in:", tmp / "exp")


if __name__ == "__main__":
    main()
