"""HDF5 MRI datasets and an XLA-friendly host-side batcher.

Functional parity with reference: mridc/collections/common/data/mri_loader.py
(``MRIDataset`` :47, ``et_query`` :20, ``_retrieve_metadata`` :204,
``get_consecutive_slices`` :272) and
mridc/collections/reconstruction/data/mri_reconstruction_loader.py
(``ReconstructionMRIDataset.__getitem__`` :108 incl. cc359 / stanford_knees
dataset formats).

TPU-first deviations:
  - no torch DataLoader: a plain numpy batcher that **pads every sample to a
    static bucket shape** (coils, h, w) so the jitted device step sees one
    shape. The reference tolerates per-file dynamic shapes; XLA cannot.
  - samples carry a ``sample_weight``/pad masks so padded regions cannot poison
    losses or metrics.
"""

from __future__ import annotations

import json
import os
import random
import re
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import h5py
import numpy as np

__all__ = ["et_query", "MRIDataset", "ReconstructionMRIDataset", "BatchLoader"]


def et_query(root, qlist: Sequence[str], namespace: str = "https://www.ismrm.org/ISMRMRD") -> str:
    """Query an ISMRMRD XML header element chain; '0' if absent (reference :20-45)."""
    s = "."
    prefix = "ismrmrd_namespace"
    ns = {prefix: namespace}
    for el in qlist:
        s += f"//{prefix}:{el}"
    value = root.find(s, ns)
    return "0" if value is None else str(value.text)


def is_none(x) -> bool:
    return x is None or str(x).lower() == "none"


class MRIDataset:
    """Base dataset: scans a directory (or JSON file list) of h5 volumes into
    per-slice examples with ISMRMRD metadata (reference mri_loader.py:47-271)."""

    def __init__(
        self,
        root: Union[str, Path, os.PathLike],
        coil_sensitivity_maps_root=None,
        mask_root=None,
        dataset_format: Optional[str] = None,
        sample_rate: Optional[float] = None,
        volume_sample_rate: Optional[float] = None,
        use_dataset_cache: bool = False,
        dataset_cache_file=None,
        num_cols: Optional[Tuple[int]] = None,
        consecutive_slices: int = 1,
        data_saved_per_slice: bool = False,
        n2r_supervised_rate: float = 0.0,
        transform: Optional[Callable] = None,
        **kwargs,
    ):
        self.coil_sensitivity_maps_root = coil_sensitivity_maps_root
        self.mask_root = mask_root
        self.dataset_format = dataset_format

        if not is_none(sample_rate) and not is_none(volume_sample_rate):
            raise ValueError("Set only one of sample_rate / volume_sample_rate.")
        sample_rate = 1.0 if is_none(sample_rate) else float(sample_rate)
        volume_sample_rate = 1.0 if is_none(volume_sample_rate) else float(volume_sample_rate)

        if consecutive_slices < 1:
            raise ValueError(f"Consecutive slices {consecutive_slices} is out of range, must be > 0.")
        self.consecutive_slices = consecutive_slices
        self.transform = transform
        self.data_saved_per_slice = data_saved_per_slice
        self.recons_key = "reconstruction"
        self.examples: List[Tuple[Path, int, Dict]] = []

        if str(root).endswith(".json"):
            with open(root, "r", encoding="utf-8") as f:
                files = [Path(ex) for ex in json.load(f)]
        else:
            files = list(Path(root).iterdir())

        # deterministic RNG: every process must select the SAME subset (the
        # loader shards by index later) and runs must be reproducible — the
        # unseeded global `random` gives neither
        _rng = random.Random(1234)
        n2r_supervised_files: List[Path] = []
        if n2r_supervised_rate:
            n2r_supervised_files = _rng.sample(sorted(files), int(np.round(n2r_supervised_rate * len(files))))

        for fname in sorted(files):
            metadata, num_slices = self._retrieve_metadata(fname)
            metadata["n2r_supervised"] = bool(n2r_supervised_rate) and fname in n2r_supervised_files
            num_slices = num_slices - (consecutive_slices - 1)
            self.examples += [(fname, s, metadata) for s in range(num_slices)]

        if sample_rate < 1.0:
            _rng.shuffle(self.examples)
            self.examples = self.examples[: round(len(self.examples) * sample_rate)]
        elif volume_sample_rate < 1.0:
            vol_names = sorted({f[0].stem for f in self.examples})
            _rng.shuffle(vol_names)
            sampled = set(vol_names[: round(len(vol_names) * volume_sample_rate)])
            self.examples = [ex for ex in self.examples if ex[0].stem in sampled]

        if num_cols and not is_none(num_cols):
            self.examples = [ex for ex in self.examples if ex[2]["encoding_size"][1] in num_cols]

    def _retrieve_metadata(self, fname) -> Tuple[Dict, int]:
        with h5py.File(fname, "r") as hf:
            if "ismrmrd_header" in hf:
                et_root = ET.fromstring(hf["ismrmrd_header"][()])
                enc = ["encoding", "encodedSpace", "matrixSize"]
                enc_size = tuple(int(et_query(et_root, enc + [d])) for d in "xyz")
                rec = ["encoding", "reconSpace", "matrixSize"]
                recon_size = tuple(int(et_query(et_root, rec + [d])) for d in "xyz")
                params = ["encoding", "encodingLimits", "kspace_encoding_step_1"]
                enc_limits_center = int(et_query(et_root, params + ["center"]))
                enc_limits_max = int(et_query(et_root, params + ["maximum"])) + 1
                padding_left = enc_size[1] // 2 - enc_limits_center
                padding_right = padding_left + enc_limits_max
            else:
                padding_left, padding_right = 0, 0
                enc_size, recon_size = (0, 0, 0), (0, 0, 0)

            if "kspace" in hf:
                shape = hf["kspace"].shape
            elif "ksp" in hf:
                shape = hf["ksp"].shape
            elif "reconstruction" in hf:
                shape = hf["reconstruction"].shape
            else:
                raise ValueError(f"{fname} does not contain kspace or reconstruction data.")

        num_slices = 1 if self.data_saved_per_slice else shape[0]
        return (
            {
                "padding_left": padding_left,
                "padding_right": padding_right,
                "encoding_size": enc_size,
                "recon_size": recon_size,
            },
            num_slices,
        )

    def get_consecutive_slices(self, data, key: str, dataslice: int) -> np.ndarray:
        """Index one slice, or a [consecutive_slices, ...] stack (reference :272-330)."""
        x = data[key]
        if self.data_saved_per_slice:
            x = np.expand_dims(x, axis=0)
        if self.consecutive_slices == 1:
            if x.shape[0] == 1:
                return x[0]
            if x.ndim != 2:
                return x[dataslice]
            return np.asarray(x)
        num_slices = x.shape[0]
        if self.consecutive_slices > num_slices:
            return np.stack(x, axis=0)
        end = min(dataslice + self.consecutive_slices, num_slices)
        return x[dataslice:end]

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, i: int):
        raise NotImplementedError


class ReconstructionMRIDataset(MRIDataset):
    """Accelerated-reconstruction dataset (reference mri_reconstruction_loader.py:18-168)."""

    def __getitem__(self, i: int):
        fname, dataslice, metadata = self.examples[i]
        with h5py.File(fname, "r") as hf:
            kspace = self.get_consecutive_slices(hf, "kspace", dataslice).astype(np.complex64, copy=False)

            if self.dataset_format is not None and str(self.dataset_format).lower() == "cc359":
                kspace = np.transpose(kspace[..., ::2] + 1j * kspace[..., 1::2], (2, 0, 1))

            if "sensitivity_map" in hf:
                sensitivity_map = self.get_consecutive_slices(hf, "sensitivity_map", dataslice).astype(np.complex64, copy=False)
            elif "maps" in hf:
                sensitivity_map = self.get_consecutive_slices(hf, "maps", dataslice).astype(np.complex64, copy=False)
            elif not is_none(self.coil_sensitivity_maps_root):
                with h5py.File(Path(self.coil_sensitivity_maps_root) / Path(fname).name, "r") as sf:
                    sensitivity_map = (
                        self.get_consecutive_slices(sf, "sensitivity_map", dataslice).squeeze().astype(np.complex64, copy=False)
                    )
            else:
                sensitivity_map = np.array([])

            if "mask" in hf:
                mask = np.asarray(self.get_consecutive_slices(hf, "mask", dataslice))
                if mask.ndim == 3 and self.consecutive_slices == 1:
                    mask = mask[dataslice]
            elif not is_none(self.mask_root):
                with h5py.File(Path(self.mask_root) / Path(fname).name, "r") as mf:
                    if str(self.dataset_format).lower() == "cc359":
                        mask = [np.asarray(self.get_consecutive_slices(mf, k, dataslice)) for k in mf.keys()]
                    else:
                        mask = np.asarray(self.get_consecutive_slices(mf, "mask", dataslice))
            else:
                mask = None

            prediction = (
                self.get_consecutive_slices(hf, "eta", dataslice).astype(np.complex64, copy=False)
                if "eta" in hf
                else np.array([])
            )

            keys = list(hf.keys())
            recon_keys = [k for k in keys if k.startswith("reconstruction")]
            if "reconstruction_rss" in keys:
                recons_key = "reconstruction_rss"
            elif "reconstruction_sense" in keys:
                recons_key = "reconstruction_sense"
            elif recon_keys:  # e.g. fastMRI reconstruction_esc, plain reconstruction
                recons_key = recon_keys[0]
            else:
                recons_key = "target"
            target = self.get_consecutive_slices(hf, recons_key, dataslice) if recons_key in hf else None

            attrs = dict(hf.attrs)
            attrs.update(metadata)

        if str(self.dataset_format).lower() == "stanford_knees":
            kspace = np.transpose(kspace, (2, 0, 1))
            sensitivity_map = np.transpose(np.squeeze(sensitivity_map), (2, 0, 1))
            target = np.squeeze(target)

        if sensitivity_map.ndim > 1 and sensitivity_map.shape != kspace.shape:
            if sensitivity_map.ndim == 3:
                sensitivity_map = np.transpose(sensitivity_map, (2, 0, 1))
            elif sensitivity_map.ndim == 4:
                sensitivity_map = np.transpose(sensitivity_map, (0, 3, 1, 2))

        if self.transform is not None:
            return self.transform(
                kspace, sensitivity_map, mask, prediction, target, attrs, str(Path(fname).name), dataslice
            )
        return kspace, sensitivity_map, mask, prediction, target, attrs, str(Path(fname).name), dataslice


def _pad_to(x: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    """Zero-pad the TRAILING dims of ``x`` up to ``shape`` (center-aligned);
    leading dims (e.g. a consecutive-slices axis) pass through unpadded."""
    if x.size == 0:
        return x
    shape = tuple(shape)[-x.ndim :]
    pads = [(0, 0)] * (x.ndim - len(shape))
    any_pad = False
    for dim, target in zip(x.shape[x.ndim - len(shape) :], shape):
        extra = max(int(target) - dim, 0)
        any_pad = any_pad or extra > 0
        pads.append((extra // 2, extra - extra // 2))
    if not any_pad:
        return x  # np.pad always copies; skip it for already-sized arrays
    return np.pad(x, pads, mode="constant")


class BatchLoader:
    """Minimal host-side batcher producing static-shape numpy batches.

    Every sample's (coils, h, w) is zero-padded to the bucket shape computed
    from the dataset (or given explicitly), and each batch carries:
      ``kspace, masked_kspace, sensitivity_maps, mask, initial_prediction,
      target, fname, slice_idx, acceleration, attrs``
    mirroring the reference 10-tuple, stacked over the batch axis.

    Per-sample *random acceleration choice* happens here (one of the mask list
    entries), so the jitted step stays pure (reference does it inside
    training_step, reconstruction/nn/base.py:289-340).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        pad_shape: Optional[Tuple[int, int, int]] = None,
        drop_last: bool = False,
        select_acceleration: str = "random",  # or "first"
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        num_workers: int = 0,
        transfer_dtype=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = int(seed)
        self._epoch = 0
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last
        self.select_acceleration = select_acceleration
        self.pad_shape = pad_shape
        # multi-host sharding (reference analogue: PTL DistributedSampler) —
        # each process iterates a disjoint, equal-length slice of the dataset.
        if process_index is None or process_count is None:
            from mridc_tpu.parallel.multihost import process_info

            pi, pc = process_info()
            process_index = pi if process_index is None else process_index
            process_count = pc if process_count is None else process_count
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        # reference parity: DataLoader(num_workers=...) (reconstruction/nn/
        # base.py:1083-1090). Threads map dataset[i] over the epoch order,
        # yielding IN ORDER (see data/prefetch.py for the grain rationale).
        self.num_workers = int(num_workers)
        # transfer_dtype: cast the heavy real-view leaves (masked_kspace /
        # sensitivity_maps / kspace / n2r_masked_kspace) to this dtype at
        # collate time, HALVING host->device bytes for bfloat16. Exact-math
        # companion to compute_dtype=bfloat16 models: they cast these inputs
        # to bf16 on device anyway, so casting before the wire moves the same
        # bits for half the transfer. mask/target/metadata stay f32 (the loss
        # is computed in f32). Off (None) by default.
        self.transfer_dtype = None
        if transfer_dtype is not None and str(transfer_dtype).lower() not in ("none", "float32", "f32"):
            import ml_dtypes  # jax dependency, always present

            name = str(transfer_dtype).lower()
            if name not in ("bfloat16", "bf16"):
                raise ValueError(f"unsupported transfer_dtype {transfer_dtype!r} (use bfloat16 or None)")
            self.transfer_dtype = np.dtype(ml_dtypes.bfloat16)

    def _local_count(self):
        n = len(self.dataset)
        if self.process_count <= 1:
            return n
        return (n + self.process_count - 1) // self.process_count

    def __len__(self):
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _sample_rng(self, idx: int) -> np.random.RandomState:
        """Per-(seed, epoch, sample) RNG for the acceleration draw. Seeding by
        sample index instead of drawing from a shared stream makes the choice
        independent of consumption order — background prefetch running ahead
        of an early-broken epoch (limit_*_batches) can no longer desync later
        epochs from the synchronous path."""
        return np.random.RandomState(np.asarray([self.seed, max(self._epoch - 1, 0), int(idx)], np.uint32))

    def _select(self, masked_kspace, mask, acc, prediction, rng=None):
        """Pick one acceleration choice from the per-sample lists."""
        rng = self.rng if rng is None else rng
        n2r_pair = None
        if (
            isinstance(masked_kspace, list)
            and len(masked_kspace) == 2
            and isinstance(masked_kspace[0], list)
        ):  # n2r: [masked_list, n2r_masked_list]
            n2r_pair = (masked_kspace[1], mask[1])
            masked_kspace, mask = masked_kspace[0], mask[0]

        if n2r_pair is not None and isinstance(prediction, list) and len(prediction) == 2:
            prediction = prediction[0]  # [clean, noise] -> clean (n2r transform layout)

        if isinstance(masked_kspace, list):
            if len(masked_kspace) > 1 and self.select_acceleration == "random":
                r = int(rng.randint(len(masked_kspace)))
            else:
                r = 0
            masked_kspace = masked_kspace[r]
            mask = mask[r]
            acc = acc[r] if isinstance(acc, (list, tuple)) else acc
        else:
            r = 0
        # unwrap per-acceleration prediction lists down to a single array
        while isinstance(prediction, list) and len(prediction):
            prediction = prediction[min(r, len(prediction) - 1)]
        return masked_kspace, mask, acc, prediction, r, n2r_pair

    def epoch_order(self) -> np.ndarray:
        """This epoch's sample-index order (shuffle + multi-host shard), and
        advance the epoch counter. One epoch's order per call — __iter__ calls
        it once per iteration; DeviceDatasetCache calls it instead of
        iterating when every sample is already device-resident."""
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # identical (seed, epoch) across processes -> identical permutation
            # (DistributedSampler-style); the strided shard below then keeps
            # per-process subsets disjoint. A dedicated RNG: the per-sample
            # acceleration draws consume self.rng data-dependently, which would
            # desynchronize a shared RNG across processes after one epoch.
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        if self.process_count > 1:
            from mridc_tpu.parallel.multihost import shard_indices

            order = order[shard_indices(len(order), self.process_index, self.process_count)]
        return order

    def __iter__(self):
        order = self.epoch_order()
        if self.num_workers > 0:
            from mridc_tpu.data.prefetch import OrderedWorkerMap

            samples = OrderedWorkerMap(lambda i: (int(i), self.dataset[int(i)]), order, self.num_workers)
        else:
            samples = ((int(idx), self.dataset[int(idx)]) for idx in order)
        batch, indices = [], []
        for idx, sample in samples:
            batch.append(sample)
            indices.append(idx)
            if len(batch) == self.batch_size:
                yield self._collate(batch, indices)
                batch, indices = [], []
        if batch and not self.drop_last:
            yield self._collate(batch, indices)

    def _collate(self, samples, indices=None):
        ks, mks, sens, msks, preds, tgts, fnames, sidx, accs, attrs = [], [], [], [], [], [], [], [], [], []
        n2r_ks, n2r_ms = [], []
        for j, s in enumerate(samples):
            kspace, masked_kspace, sensitivity_map, mask, prediction, target, fname, slice_idx, acc, attr = s
            rng = self._sample_rng(indices[j]) if indices is not None else None
            masked_kspace, mask, acc, prediction, r, n2r_pair = self._select(
                masked_kspace, mask, acc, prediction, rng
            )
            if n2r_pair is not None:
                n2r_masked, n2r_mask = n2r_pair
                n2r_ks.append(n2r_masked[r] if isinstance(n2r_masked, list) else n2r_masked)
                n2r_ms.append(np.asarray(n2r_mask[r] if isinstance(n2r_mask, list) else n2r_mask, np.float32))
            if isinstance(kspace, list):
                kspace = kspace[r]
            if isinstance(target, list):
                # per-acceleration targets follow the selected input
                # (reference nn/base.py:337-340)
                target = target[min(r, len(target) - 1)]
            # SSDU: mask entry is [train, loss]
            if isinstance(mask, list):
                mask = np.stack([np.asarray(m, np.float32) for m in mask], 0)
            ks.append(kspace)
            mks.append(masked_kspace)
            sens.append(sensitivity_map)
            msks.append(np.asarray(mask, np.float32))
            preds.append(prediction)
            tgts.append(target)
            fnames.append(fname)
            sidx.append(slice_idx)
            accs.append(float(acc))
            attrs.append(attr)

        if self.pad_shape is not None:
            tgt_shape = self.pad_shape
        else:
            coils = max(x.shape[0] for x in ks)
            h = max(x.shape[-2] for x in ks)
            w = max(x.shape[-1] for x in ks)
            tgt_shape = (coils, h, w)

        def rv(x):
            # device arrays are float32 real views [..., 2]; complex stays host-side.
            # complex64 memory IS interleaved (re, im) float32 pairs, so the
            # real view is a zero-copy reinterpret (bit-identical to stacking
            # .real/.imag) — the old np.stack copy was ~60% of collate time.
            x = np.asarray(x)
            if np.iscomplexobj(x):
                x = np.ascontiguousarray(x, dtype=np.complex64)
                return x.view(np.float32).reshape(x.shape + (2,))
            return np.stack([x, np.zeros_like(x)], axis=-1).astype(np.float32)

        def stack_c(xs):
            return np.stack([rv(_pad_to(np.asarray(x), tgt_shape)) for x in xs], 0)

        spatial = tgt_shape[-2:]
        def pad_mask(m):
            # singleton axes broadcast — only pad non-singleton spatial dims
            m = np.asarray(m, np.float32)
            target = tuple(m.shape[:-2]) + tuple(
                t if s > 1 else 1 for s, t in zip(m.shape[-2:], spatial)
            )
            return _pad_to(m, target)

        masks = np.stack([pad_mask(m) for m in msks], 0)
        out_batch = {
            "kspace": stack_c(ks),
            "masked_kspace": stack_c(mks),
            "sensitivity_maps": stack_c(sens),
            "mask": masks,
            "target": np.stack([rv(_pad_to(np.asarray(t), spatial)) for t in tgts], 0),
            "fname": fnames,
            "slice_idx": np.asarray(sidx, np.int32),
            "acceleration": np.asarray(accs, np.float32),
            "attrs": attrs,
        }
        if indices is not None:
            # dataset indices of this batch's samples — lets cache layers
            # (data/cache.py) key device-resident storage by sample
            out_batch["sample_indices"] = np.asarray(indices, np.int32)
        if all(np.asarray(p).size for p in preds):
            out_batch["initial_prediction"] = np.stack(
                [rv(_pad_to(np.asarray(p), spatial)) for p in preds], 0
            )
        if n2r_ks:
            out_batch["n2r_masked_kspace"] = stack_c(n2r_ks)
            out_batch["n2r_mask"] = np.stack([pad_mask(m) for m in n2r_ms], 0)
        if self.transfer_dtype is not None:
            for k in ("kspace", "masked_kspace", "sensitivity_maps", "n2r_masked_kspace"):
                if k in out_batch:
                    out_batch[k] = out_batch[k].astype(self.transfer_dtype)
        return out_batch
