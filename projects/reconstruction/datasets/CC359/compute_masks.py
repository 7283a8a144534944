"""Attach the CC359 Poisson-disc masks (R5/R10 .npy banks) to each data file.

Functional parity with reference:
projects/reconstruction/datasets/CC359/compute_masks.py — for every h5 volume,
pick the shape-matched R5/R10 mask bank, tile/sample it to the volume's slice
count, and write ``mask_5x`` / ``mask_10x`` datasets next to the data.
"""

from __future__ import annotations

import argparse
import pathlib

import h5py
import numpy as np

__all__ = ["extend_mask_bank", "main"]


def extend_mask_bank(bank: np.ndarray, n_slices: int, rng=None) -> np.ndarray:
    """Tile the mask bank (doubling first, as the reference does) and top up
    with randomly chosen masks until it covers ``n_slices``."""
    rng = rng or np.random.default_rng()
    bank = np.concatenate((bank, bank), axis=0)
    missing = n_slices - bank.shape[0]
    if missing > 0:
        # with replacement: a volume may need many more slices than the bank
        # holds (replace=False crashed for n_slices > 4x the original bank)
        extra = rng.choice(bank.shape[0], missing, replace=missing > bank.shape[0])
        bank = np.concatenate((bank, bank[extra]), axis=0)
    return bank[:n_slices]


def main(data_dir: pathlib.Path, masks_dir: pathlib.Path, output_dir: pathlib.Path, seed=None):
    output_dir.mkdir(parents=True, exist_ok=True)
    output_dir = output_dir / data_dir.name
    output_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    for data_file in sorted(data_dir.glob("*.h5")):
        with h5py.File(data_file, "r") as f:
            shape = f["kspace"].shape  # [slices, x, y, ...]
        out = {}
        for acc, name in ((5, "mask_5x"), (10, "mask_10x")):
            bank = np.load(masks_dir / f"R{acc}_{shape[1]}x{shape[2]}.npy")
            out[name] = extend_mask_bank(bank, shape[0], rng)
        with h5py.File(output_dir / data_file.name, "w") as f:
            for name, val in out.items():
                f.create_dataset(name, data=val)
    return output_dir


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data_dir", type=pathlib.Path)
    p.add_argument("masks_dir", type=pathlib.Path)
    p.add_argument("output_dir", type=pathlib.Path)
    a = p.parse_args()
    main(a.data_dir, a.masks_dir, a.output_dir)
