"""Reformat per-slice AHEAD qMRI h5 files into the loader's multicoil layout.

Functional parity with reference:
projects/quantitative/datasets/ahead/reformat.py — walk
Subcortex_*/<plane>/*.h5 trees, group quantitative-map files with their data
and subsampling masks, and write one consolidated h5 per slice under
multicoil_{set}/ carrying {R2star,B0,S0,phi}_map_{init,target,recon_Ax},
kspace, sensitivity maps, masks and brain/head masks.
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

import h5py

__all__ = ["iterate_qmap", "reformat", "main"]


def iterate_qmap(qmap, name):
    """Split a list of (key, value) pairs into recon/init/target groups keyed
    by acceleration (reference ``iterate_qmap``)."""
    recons, recon_accs = [], []
    for key, val in qmap:
        if "recon" in key:
            acc = key.split("_")[4]
            recon_accs.append(acc)
            recons.append([f"{name}_recon_{acc}x", val])
    inits, targets, accs = [], [], []
    target_saved = False
    for key, val in qmap:
        if "init" in key:
            if len(key.split("_")) > 3:
                acc = key.split("_")[-1]
                if acc not in accs and acc in recon_accs:
                    accs.append(acc)
                    inits.append([f"{name}_init_{acc}x", val])
        elif "target" in key and not target_saved:
            target_saved = True
            targets.append([f"{name}_target", val])
    return recons, inits, targets, accs


def _collect(files):
    maps, data = [], []
    for group in files:
        for f in group:
            name = Path(f).name  # classify by FILENAME: a path component
            # containing 'cs'/'maps' must not swallow every file
            if "cs" in name:
                continue
            if "kspmask" in name:
                continue  # standalone k-space mask files pair with nothing
            if "maps" in name:
                maps.append(Path(f))
            else:
                data.append(Path(f))
    return sorted(maps), sorted(data)


def reformat(file_path: Path, out_path: Path, which_set: str = "train"):
    out_dir = Path(out_path) / f"multicoil_{which_set}"
    out_dir.mkdir(parents=True, exist_ok=True)

    subjects = [p for p in Path(file_path).iterdir() if "Subcortex" in p.name]
    files = [glob.glob(str(plane) + "/*.h5") for s in subjects for plane in s.iterdir()]
    maps, data = _collect(files)

    written = []
    if which_set != "test" and maps:
        # pair by stem, not by sorted position: one missing maps file must not
        # shift every subsequent pairing onto the wrong slice
        maps_by_stem = {p.stem.replace("_maps", ""): p for p in maps}
        pairs = [(maps_by_stem.get(d.stem), d) for d in data]
        missing = [d.name for m, d in pairs if m is None]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} data file(s) have no matching *_maps.h5 (e.g. {missing[0]})"
            )
    else:
        pairs = [(None, d) for d in data]
    for _maps, _data in pairs:
        fname = _data.stem
        groups = {"B0_map": [], "R2star_map": [], "S0_map": [], "phi_map": []}
        kspace = mask_brain = mask_head = sense = None
        masks = []

        def scan(h5file):
            nonlocal kspace, mask_brain, mask_head, sense
            for key in h5file.keys():
                val = h5file[key][()]
                # quantitative-map keys first: recon method names may contain
                # "sense" (e.g. R2star_map_recon_sense_5x)
                if "B0_map" in key:
                    groups["B0_map"].append([key, val])
                elif "R2star_map" in key:
                    groups["R2star_map"].append([key, val])
                elif "S0_map" in key:
                    groups["S0_map"].append([key, val])
                elif "phi_map" in key:
                    groups["phi_map"].append([key, val])
                elif "sense" in key and sense is None:
                    sense = val
                elif "ksp" in key and kspace is None:
                    kspace = val
                elif "mask_brain" in key and mask_brain is None:
                    mask_brain = val
                elif "mask_head" in key and mask_head is None:
                    mask_head = val
                elif "subsampling_mask" in key:
                    masks.append([key, val])

        if _maps is not None:
            with h5py.File(_maps, "r") as f:
                scan(f)
        with h5py.File(_data, "r") as f:
            scan(f)

        out = {}
        any_recons = True
        for name, qmap in groups.items():
            recons, inits, targets, accs = iterate_qmap(qmap, name)
            if not recons and which_set != "test":
                any_recons = False
            for key, val in recons + inits + targets:
                out[key] = val
            if name == "R2star_map":
                for key, val in masks:
                    acc = key.split("_")[3]
                    # first-wins per acceleration (reference reformat.py:154-158
                    # guards with 'acc not in masks_accs')
                    if acc in accs and f"mask_{acc}x" not in out:
                        out[f"mask_{acc}x"] = val
        if which_set != "test" and not any_recons:
            continue
        with h5py.File(out_dir / f"{fname}.h5", "w") as f:
            for key, val in out.items():
                f.create_dataset(key, data=val)
            if kspace is not None:
                f.create_dataset("kspace", data=kspace)
            if sense is not None:
                f.create_dataset("sensitivity_map", data=sense)
            if mask_brain is not None:
                f.create_dataset("mask_brain", data=mask_brain)
            if mask_head is not None:
                f.create_dataset("mask_head", data=mask_head)
        written.append(out_dir / f"{fname}.h5")
    return written


def main(args):
    return reformat(args.file_path, args.out_path, args.set)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("file_path", type=Path)
    p.add_argument("out_path", type=Path)
    p.add_argument("--set", default="train", choices=["train", "val", "test"])
    main(p.parse_args())
