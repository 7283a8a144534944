"""Task-specific HDF5 datasets: segmentation, joint recon+segmentation, qMRI.

Functional parity with reference:
mridc/collections/segmentation/data/mri_segmentation_loader.py (kspace/ksp +
``segmentation`` labels, optional separate segmentations_root),
mridc/collections/multitask/rs/data/mrirs_loader.py:15 (``RSMRIDataset``),
mridc/collections/quantitative/data/qmri_loader.py (AHEAD format: kspace,
mask_brain/mask_head, {B0,S0,R2star,phi}_map_target / _init_).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import h5py
import numpy as np

from mridc_tpu.data.loaders import MRIDataset, is_none

__all__ = ["SegmentationMRIDataset", "RSMRIDataset", "qMRIDataset"]


class SegmentationMRIDataset(MRIDataset):
    """Returns (kspace, sensitivity_map, mask, initial_prediction, target,
    segmentation_labels, attrs, fname, slice_idx)."""

    def __init__(self, *args, segmentations_root=None, complex_data: bool = True, **kwargs):
        self.segmentations_root = segmentations_root
        self.complex_data = complex_data
        super().__init__(*args, **kwargs)

    def _load_segmentation(self, hf, fname, dataslice):
        if self.segmentations_root is not None and not is_none(self.segmentations_root):
            with h5py.File(Path(self.segmentations_root) / Path(fname).name, "r") as sf:
                return np.asarray(self.get_consecutive_slices(sf, "segmentation", dataslice))
        if "segmentation" in hf:
            return np.asarray(self.get_consecutive_slices(hf, "segmentation", dataslice))
        return np.array([])

    def __getitem__(self, i: int):
        fname, dataslice, metadata = self.examples[i]
        with h5py.File(fname, "r") as hf:
            if self.complex_data:
                key = "kspace" if "kspace" in hf else "ksp"
                kspace = self.get_consecutive_slices(hf, key, dataslice).astype(np.complex64, copy=False)
                sensitivity_map = (
                    self.get_consecutive_slices(hf, "sensitivity_map", dataslice).astype(np.complex64, copy=False)
                    if "sensitivity_map" in hf
                    else np.array([])
                )
                mask = (
                    np.asarray(self.get_consecutive_slices(hf, "mask", dataslice)) if "mask" in hf else None
                )
                imspace = np.array([])
            else:
                key = "reconstruction" if "reconstruction" in hf else "target"
                imspace = self.get_consecutive_slices(hf, key, dataslice)
                kspace = np.array([])
                sensitivity_map = np.array([])
                mask = None
            segmentation = self._load_segmentation(hf, fname, dataslice)
            attrs = dict(hf.attrs)
            attrs.update(metadata)

        if self.transform is not None:
            return self.transform(
                kspace, sensitivity_map, mask, imspace, segmentation, attrs, str(Path(fname).name), dataslice
            )
        return (kspace, sensitivity_map, mask, imspace, segmentation, attrs, str(Path(fname).name), dataslice)


class RSMRIDataset(MRIDataset):
    """Joint recon+seg dataset: kspace + reconstruction target + segmentation."""

    def __init__(self, *args, segmentations_root=None, **kwargs):
        self.segmentations_root = segmentations_root
        super().__init__(*args, **kwargs)

    def __getitem__(self, i: int):
        fname, dataslice, metadata = self.examples[i]
        with h5py.File(fname, "r") as hf:
            key = "kspace" if "kspace" in hf else "ksp"
            kspace = self.get_consecutive_slices(hf, key, dataslice).astype(np.complex64, copy=False)
            sensitivity_map = (
                self.get_consecutive_slices(hf, "sensitivity_map", dataslice).astype(np.complex64, copy=False)
                if "sensitivity_map" in hf
                else np.array([])
            )
            mask = np.asarray(self.get_consecutive_slices(hf, "mask", dataslice)) if "mask" in hf else None
            target = np.array([])
            for k in ("reconstruction_rss", "reconstruction_sense", "reconstruction", "target"):
                if k in hf:
                    target = self.get_consecutive_slices(hf, k, dataslice)
                    break
            if self.segmentations_root is not None and not is_none(self.segmentations_root):
                with h5py.File(Path(self.segmentations_root) / Path(fname).name, "r") as sf:
                    segmentation = np.asarray(self.get_consecutive_slices(sf, "segmentation", dataslice))
            elif "segmentation" in hf:
                segmentation = np.asarray(self.get_consecutive_slices(hf, "segmentation", dataslice))
            else:
                segmentation = np.array([])
            attrs = dict(hf.attrs)
            attrs.update(metadata)

        if self.transform is not None:
            return self.transform(
                kspace, sensitivity_map, mask, target, segmentation, attrs, str(Path(fname).name), dataslice
            )
        return (kspace, sensitivity_map, mask, target, segmentation, attrs, str(Path(fname).name), dataslice)


class qMRIDataset(MRIDataset):
    """AHEAD-format quantitative dataset (reference qmri_loader.py)."""

    def __init__(self, *args, sequence: str = "MEGRE", **kwargs):
        self.sequence = sequence
        super().__init__(*args, **kwargs)

    @staticmethod
    def _first_matching(hf, prefix, dataslice, get):
        for k in sorted(hf.keys()):
            if k.startswith(prefix):
                return np.asarray(get(hf, k, dataslice))
        return np.empty([])

    def __getitem__(self, i: int):
        fname, dataslice, metadata = self.examples[i]
        with h5py.File(fname, "r") as hf:
            kspace = self.get_consecutive_slices(hf, "kspace", dataslice).astype(np.complex64, copy=False)
            sensitivity_map = (
                self.get_consecutive_slices(hf, "sensitivity_map", dataslice).astype(np.complex64, copy=False)
                if "sensitivity_map" in hf
                else np.array([])
            )
            mask = np.asarray(self.get_consecutive_slices(hf, "mask", dataslice)) if "mask" in hf else None
            mask_brain = (
                np.asarray(self.get_consecutive_slices(hf, "mask_brain", dataslice))
                if "mask_brain" in hf
                else np.empty([])
            )
            mask_head = (
                np.asarray(self.get_consecutive_slices(hf, "mask_head", dataslice))
                if "mask_head" in hf
                else np.empty([])
            )
            get = self.get_consecutive_slices
            qmaps = {}
            for name in ("B0", "S0", "R2star", "phi"):
                tgt_key = f"{name}_map_target"
                qmaps[f"{name}_map_target"] = (
                    get(hf, tgt_key, dataslice) if tgt_key in hf else np.empty([])
                )
                qmaps[f"{name}_map_init"] = self._first_matching(hf, f"{name}_map_init_", dataslice, get)
            target = None
            for k in ("reconstruction_rss", "reconstruction_sense", "reconstruction", "target"):
                if k in hf:
                    target = self.get_consecutive_slices(hf, k, dataslice)
                    break
            attrs = dict(hf.attrs)
            attrs.update(metadata)

        sample = (
            kspace,
            sensitivity_map,
            qmaps,
            mask,
            mask_brain,
            mask_head,
            target,
            attrs,
            str(Path(fname).name),
            dataslice,
        )
        if self.transform is not None:
            return self.transform(*sample)
        return sample
