"""AHEAD dataset preprocessing: raw coil images -> per-slice qMRI h5 files.

Functional parity with reference:
projects/quantitative/datasets/ahead/preprocessing.py — per subject: load the
4-echo complex coil images, sensitivity maps (.mat v7.3 / h5) and brain mask,
compute the 3D B0 map (SENSE combine, phase unwrap, brain-mean 2-pi
correction of the echo differences, least-squares fit over TE diffs), build
2D k-space for the sagittal/coronal/axial planes with an ortho fftshifted
fft2, and write one h5 per center slice with ``ksp/sense/B0map/mask_brain``.

NIfTI loading uses SimpleITK or nibabel when available; the numeric pipeline
(`b0_mapping`, `generate_2d_kspace`, `save_subject_slices`) is importable and
array-in/array-out so it runs on any source.
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path

import h5py
import numpy as np

from mridc_tpu.ops.unwrap import unwrap_phase

TES = (3.0, 11.5, 20.0, 28.5)
SCALING = 1e-3

__all__ = ["b0_mapping", "generate_2d_kspace", "save_subject_slices", "main"]


def _read_nifti(path):
    try:
        import SimpleITK as sitk

        return sitk.GetArrayFromImage(sitk.ReadImage(str(path)))
    except ImportError:
        pass
    try:
        import nibabel as nib

        return np.asanyarray(nib.load(str(path)).dataobj).T
    except ImportError as e:
        raise ImportError("AHEAD NIfTI loading needs SimpleITK or nibabel") from e


def load_subject(subject_id: str, datapath: str):
    """Coil images [E, X, Y, Z], complex sense maps, brain mask (reference
    ``_dataloder``)."""
    folders = glob.glob(os.path.join(datapath, f"Subcortex_{subject_id.zfill(4)}*_R02"))
    if not folders:
        return None, None, None
    folder = folders[0]
    sense_files = glob.glob(os.path.join(folder, f"Subcortex_{subject_id.zfill(4)}*_R02_inv2_rcal.mat"))
    stem = f"Subcortex_{subject_id.zfill(4)}*_R02_inv2_"
    coil_files = [glob.glob(os.path.join(folder, f"{stem}{i}_gdataCorrected.nii.gz")) for i in range(1, 5)]
    if not sense_files or not all(coil_files):
        return None, None, None
    with h5py.File(sense_files[0], "r") as f:
        raw = np.array(next(iter(f.values())))
        sense = np.transpose(raw["real"] + 1j * raw["imag"], (3, 2, 1, 0))
    coilimgs = np.stack([np.transpose(_read_nifti(c[0]), (3, 2, 1, 0)) for c in coil_files], 0)
    brain_mask = _read_nifti(os.path.join(folder, "nii", "mask_inv2_te2_m_corr.nii"))
    brain_mask = np.flip(np.transpose(brain_mask, (0, 2, 1)), 1)
    return coilimgs, sense, brain_mask


def b0_mapping(coilimgs: np.ndarray, sense: np.ndarray, mask_brain: np.ndarray,
               tes=TES, te_not_used: int = 3) -> np.ndarray:
    """B0 map from the echo train (reference ``B0mapping``): SENSE combine,
    per-echo phase unwrap, brain-mean 2-pi correction of successive phase
    differences, least-squares slope over the TE differences (ms * 1e-3)."""
    imgs = np.sum(coilimgs * sense.conj(), -1)
    phases = np.angle(imgs)
    unwrapped = np.stack([unwrap_phase(phases[i]) for i in range(phases.shape[0])])

    diffs, te_diffs = [], []
    flat_mask = mask_brain.reshape(-1).astype(np.float64)
    for i in range(unwrapped.shape[0] - te_not_used):
        d = (unwrapped[i + 1] - unwrapped[i]).reshape(-1)
        d = d - np.round(np.sum(d * flat_mask) / np.sum(flat_mask) / (2 * np.pi)) * 2 * np.pi
        diffs.append(d)
        te_diffs.append(tes[i + 1] - tes[i])
    a = np.asarray(te_diffs, np.float64)[:, None] * SCALING  # [D, 1]
    y = np.stack(diffs, 0)  # [D, N]
    slope = np.linalg.pinv(a) @ y  # [1, N]
    return slope.reshape(unwrapped.shape[1:4])


def generate_2d_kspace(images3d: np.ndarray, dim2keep: int) -> np.ndarray:
    """Per-plane 2D k-space (reference ``generate_2dksp``): ortho fft2 over the
    two axes orthogonal to ``dim2keep``, fftshifted."""
    axes = [[2, 3], [1, 3], [1, 2]][dim2keep]
    return np.fft.fftshift(np.fft.fft2(images3d, axes=axes, norm="ortho"), axes=axes)


def save_subject_slices(coilimgs, sense, brain_mask, b0map, subject_id, savepath,
                        half_nr_of_slices: int = 25):
    """Write one h5 per center slice per plane (reference main loop)."""
    planes = ["sagittal", "coronal", "axial"]
    folder_subject = f"Subcortex_{str(subject_id).zfill(4)}_R02_inv2"
    written = []
    for dim in range(3):
        ksp = generate_2d_kspace(coilimgs, dim)
        ksp_dim = np.swapaxes(ksp, 1, dim + 1)
        sense_dim = np.swapaxes(sense, 0, dim)
        b0_dim = np.swapaxes(b0map, 0, dim)
        mask_dim = np.swapaxes(brain_mask, 0, dim)
        size_dim = coilimgs.shape[dim + 1]
        out_dir = Path(savepath) / folder_subject / planes[dim]
        out_dir.mkdir(parents=True, exist_ok=True)
        lo = round(size_dim / 2) - half_nr_of_slices
        hi = round(size_dim / 2) + half_nr_of_slices
        for i in range(max(lo, 0), min(hi, size_dim)):
            fname = out_dir / f"Subcortex_{str(subject_id).zfill(4)}_{planes[dim]}_{i}.h5"
            with h5py.File(fname, "w") as f:
                f.create_dataset("ksp", data=ksp_dim[:, i].squeeze())
                f.create_dataset("sense", data=sense_dim[i].squeeze())
                f.create_dataset("B0map", data=b0_dim[i].squeeze())
                f.create_dataset("mask_brain", data=mask_dim[i].squeeze())
            written.append(fname)
    return written


def main(datapath: str, savepath: str, applymask: bool = False, centerslices: bool = True):
    half = 25 if centerslices else 50
    for subject_id in range(1, 119):
        coilimgs, sense, brain_mask = load_subject(str(subject_id), datapath)
        if coilimgs is None:
            continue
        if applymask:
            coilimgs = coilimgs * brain_mask[..., None]
            sense = sense * brain_mask[..., None]
        b0map = b0_mapping(coilimgs, sense, brain_mask)
        save_subject_slices(coilimgs, sense, brain_mask, b0map, subject_id, savepath, half)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("datapath")
    p.add_argument("savepath")
    p.add_argument("--applymask", action="store_true")
    # default matches the python API default (centerslices=True); the flag
    # disables it (previously the CLI default silently inverted the API's)
    p.add_argument("--no-centerslices", dest="centerslices", action="store_false")
    a = p.parse_args()
    main(a.datapath, a.savepath, a.applymask, a.centerslices)
