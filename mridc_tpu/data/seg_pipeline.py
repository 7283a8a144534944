"""Segmentation / multitask host pipelines: sample transforms + batchers.

Plays the role of reference mridc/collections/segmentation/parts/transforms.py
and multitask/rs/parts/transforms.py (``RSMRIDataTransforms`` :27): convert
(kspace | image, segmentation labels) into static-shape training batches.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from mridc_tpu.data.loaders import BatchLoader
from mridc_tpu.data.transforms import MRIDataTransforms, _np_ifft2

__all__ = ["SegmentationDataTransforms", "RSMRIDataTransforms", "SegBatchLoader", "RSBatchLoader"]


def _to_onehot(seg: np.ndarray, num_classes: Optional[int]) -> np.ndarray:
    seg = np.asarray(seg)
    if seg.ndim >= 3 and (num_classes is None or seg.shape[0] == num_classes):
        # already [classes, H, W] -> class-axis-last
        return np.moveaxis(seg, 0, -1).astype(np.float32)
    n = num_classes or int(seg.max()) + 1
    return np.eye(n, dtype=np.float32)[seg.astype(np.int64)]


class SegmentationDataTransforms:
    """(kspace | image, segmentation) -> {image [H, W, Cin], segmentation
    [H, W, classes]} with magnitude or complex-rv input channels (reference
    segmentation nn/base.py:46-52 input conventions)."""

    def __init__(
        self,
        complex_data: bool = True,
        magnitude_input: bool = True,
        input_channels: int = 1,
        output_classes: Optional[int] = None,
        normalize_inputs: bool = True,
        fft_centered: bool = False,
        fft_normalization: str = "backward",
        coil_combination_method: str = "RSS",
    ):
        self.complex_data = complex_data
        self.magnitude_input = magnitude_input
        self.input_channels = input_channels
        self.output_classes = output_classes
        self.normalize_inputs = normalize_inputs
        self.fft_centered = fft_centered
        self.fft_normalization = fft_normalization
        self.coil_combination_method = coil_combination_method.upper()

    def __call__(self, kspace, sensitivity_map, mask, imspace, segmentation, attrs, fname, slice_idx):
        if self.complex_data and np.size(kspace):
            img = _np_ifft2(np.asarray(kspace), self.fft_centered, self.fft_normalization)
            if self.coil_combination_method == "SENSE" and np.size(sensitivity_map):
                image = (img * np.conj(sensitivity_map)).sum(0)
            else:
                image = np.sqrt((np.abs(img) ** 2).sum(0))
        else:
            image = np.asarray(imspace)
        if self.magnitude_input or self.input_channels == 1:
            x = np.abs(image).astype(np.float32)[..., None]
        else:
            x = np.stack([image.real, image.imag], -1).astype(np.float32)
        if self.normalize_inputs:
            x = x / max(np.abs(x).max(), 1e-12)
        seg = _to_onehot(segmentation, self.output_classes)
        return {"image": x, "segmentation": seg, "fname": fname, "slice_idx": slice_idx, "attrs": attrs}


class RSMRIDataTransforms(MRIDataTransforms):
    """Joint recon+seg transform: the standard recon 10-tuple plus one-hot
    segmentation labels (reference multitask/rs/parts/transforms.py:27)."""

    def __init__(self, output_classes: Optional[int] = None, **kwargs):
        super().__init__(**kwargs)
        self.output_classes = output_classes

    def __call__(self, kspace, sensitivity_map, mask, target, segmentation, attrs, fname, slice_idx):
        out = super().__call__(kspace, sensitivity_map, mask, None, target, attrs, fname, slice_idx)
        seg = _to_onehot(segmentation, self.output_classes)
        return out + (seg,)


class SegBatchLoader:
    """Batches SegmentationDataTransforms dicts into stacked arrays."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False, seed: int = 0, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batch = []
        for idx in order:
            batch.append(self.dataset[int(idx)])
            if len(batch) == self.batch_size:
                yield self._collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield self._collate(batch)

    @staticmethod
    def _collate(samples):
        return {
            "image": np.stack([s["image"] for s in samples], 0),
            "segmentation": np.stack([s["segmentation"] for s in samples], 0),
            "fname": [s["fname"] for s in samples],
            "slice_idx": np.asarray([s["slice_idx"] for s in samples], np.int32),
        }


class RSBatchLoader(BatchLoader):
    """Recon BatchLoader that additionally stacks segmentation labels."""

    def _collate(self, samples):
        segs = [s[-1] for s in samples]
        base = super()._collate([s[:-1] for s in samples])
        base["segmentation"] = np.stack(segs, 0)
        return base
