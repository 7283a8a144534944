"""Comparison panels of saved reconstructions against the target.

Functional parity with reference: projects/unselfsupervised/plot_recons.py —
for chosen slices, render a row of [target, zero-filled, each method] with
SSIM/PSNR annotations and save a PNG per slice. Paths/labels come from the
command line instead of the reference's hard-coded cluster paths.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import numpy as np

from mridc_tpu.metrics.reconstruction import psnr, ssim


def _load_slice(path: Path, fname: str, slice_idx: int, key: str = "reconstruction"):
    with h5py.File(Path(path) / fname, "r") as f:
        vol = np.abs(np.asarray(f[key]))
    s = vol[slice_idx]
    return s / (s.max() or 1.0)


def plot(targets_dir, recon_dirs, labels, out_dir, slices, key="reconstruction"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.style.use("dark_background")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for tfile in sorted(Path(targets_dir).glob("*.h5")):
        for slice_idx in slices:
            target = _load_slice(targets_dir, tfile.name, slice_idx, key)
            panels = [("Target", target, None, None)]
            for d, label in zip(recon_dirs, labels):
                if not (Path(d) / tfile.name).exists():
                    continue
                recon = _load_slice(d, tfile.name, slice_idx, key)
                panels.append(
                    (label, recon, ssim(target[None], recon[None]), psnr(target[None], recon[None]))
                )
            fig, axes = plt.subplots(1, len(panels), figsize=(3 * len(panels), 3.4))
            axes = np.atleast_1d(axes)
            for ax, (label, img, s, p) in zip(axes, panels):
                ax.imshow(img, cmap="gray")
                title = label if s is None else f"{label}\nSSIM {s:.3f} / PSNR {p:.1f}"
                ax.set_title(title, fontsize=8)
                ax.axis("off")
            out = out_dir / f"{tfile.stem}_slice{slice_idx}.png"
            fig.savefig(out, bbox_inches="tight", dpi=150)
            plt.close(fig)
            written.append(out)
    return written


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("targets_dir", type=Path)
    p.add_argument("--recons", type=Path, action="append", required=True,
                   help="Reconstruction directory (repeatable).")
    p.add_argument("--labels", action="append", required=True)
    p.add_argument("--out", type=Path, default=Path("plots"))
    p.add_argument("--slices", type=int, nargs="+", default=[0])
    a = p.parse_args()
    plot(a.targets_dir, a.recons, a.labels, a.out, a.slices)
