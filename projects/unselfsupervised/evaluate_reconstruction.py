"""Offline evaluation of saved reconstructions vs targets.

Functional parity with reference:
projects/unselfsupervised/evaluate_reconstruction.py — runstats mean/std of
MSE/NMSE/PSNR/SSIM over h5 reconstruction files, with center-crop to the
smallest common shape. Uses mridc_tpu's skimage-parity metric functions.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import numpy as np

from mridc_tpu.data.transforms import _center_crop as center_crop
from mridc_tpu.metrics.reconstruction import METRIC_FUNCS, ReconstructionMetrics


def evaluate(targets_dir: Path, reconstructions_dir: Path,
             target_key: str = "reconstruction", recon_key: str = "reconstruction"):
    metrics = ReconstructionMetrics(METRIC_FUNCS)
    matched = 0
    for tfile in sorted(Path(targets_dir).glob("*.h5")):
        rfile = Path(reconstructions_dir) / tfile.name
        if not rfile.exists():
            continue
        matched += 1
        with h5py.File(tfile, "r") as f:
            target = np.abs(np.asarray(f[target_key]))
        with h5py.File(rfile, "r") as f:
            recon = np.abs(np.asarray(f[recon_key]))
        crop = (min(target.shape[-2], recon.shape[-2]), min(target.shape[-1], recon.shape[-1]))
        target = center_crop(target, crop)
        recon = center_crop(recon, crop)
        target = target / (target.max() or 1.0)
        recon = recon / (recon.max() or 1.0)
        metrics.push(target, recon)
    if matched == 0:
        raise FileNotFoundError(
            f"no reconstruction in {reconstructions_dir} matches any target in {targets_dir} "
            "(zero metrics would be fabricated otherwise — check the directories/filenames)"
        )
    return metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("targets_dir", type=Path)
    p.add_argument("reconstructions_dir", type=Path)
    p.add_argument("--target-key", default="reconstruction")
    p.add_argument("--recon-key", default="reconstruction")
    a = p.parse_args()
    m = evaluate(a.targets_dir, a.reconstructions_dir, a.target_key, a.recon_key)
    print(repr(m))
