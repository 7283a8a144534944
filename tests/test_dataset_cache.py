"""Dataset cache tests: the host transformed-sample cache and the HBM
device-resident dataset cache must be exactly epoch-transparent (values,
batch composition, shuffle order, metadata) vs the uncached pipeline.

Reference role being matched: torch DataLoader re-runs the transform every
epoch (reconstruction/nn/base.py:1083-1090); here epoch >= 2 serves cached
samples / device-resident gathers instead (docs/data.md)."""

import numpy as np
import pytest

from mridc_tpu.data.cache import (
    CachedDataset,
    DeviceDatasetCache,
    loader_is_epoch_static,
    transform_is_epoch_deterministic,
)
from mridc_tpu.data.factory import build_dataloader
from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
from mridc_tpu.data.subsample import create_masker
from mridc_tpu.data.transforms import MRIDataTransforms

from fixtures import create_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mock_cache")
    create_dataset(root, n_files=2, slices=3, coils=4, h=64, w=64)
    return root


def _make_tfm(use_seed=True, **kw):
    return MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.08], [4])],
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
        coil_combination_method="SENSE",
        use_seed=use_seed,
        **kw,
    )


class CountingDataset:
    """Wraps a dataset and counts raw __getitem__ calls."""

    def __init__(self, dataset):
        self.dataset = dataset
        self.calls = 0

    def __getattr__(self, name):
        return getattr(self.dataset, name)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        self.calls += 1
        return self.dataset[i]


def _sample_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        if isinstance(x, list):
            for xi, yi in zip(x, y):
                np.testing.assert_array_equal(np.asarray(xi), np.asarray(yi))
        elif isinstance(x, np.ndarray):
            np.testing.assert_array_equal(x, y)
        elif isinstance(x, dict):
            assert set(x) == set(y)
        else:
            assert x == y


@pytest.mark.parametrize("mode", ["memory", "disk"])
def test_cached_dataset_serves_identical_samples_once(dataset_dir, mode, tmp_path):
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=_make_tfm())
    counted = CountingDataset(ds)
    cached = CachedDataset(counted, mode=mode, cache_dir=tmp_path / "cache")
    first = [cached[i] for i in range(len(cached))]
    assert counted.calls == len(cached)
    second = [cached[i] for i in range(len(cached))]
    assert counted.calls == len(cached)  # no extra raw reads
    for a, b in zip(first, second):
        _sample_equal(a, b)
    # and identical to a fresh uncached read (fname-seeded masks)
    fresh = ReconstructionMRIDataset(root=dataset_dir, transform=_make_tfm())
    for i, a in enumerate(first):
        _sample_equal(a, fresh[i])


def test_determinism_gates():
    assert transform_is_epoch_deterministic(_make_tfm(use_seed=True))
    assert not transform_is_epoch_deterministic(_make_tfm(use_seed=False))
    assert not transform_is_epoch_deterministic(
        _make_tfm(use_seed=True, n2r=True, n2r_probability=0.5, n2r_std_devs=(0.1, 0.2))
    )


def _loader(dataset_dir, **kw):
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=_make_tfm())
    return BatchLoader(ds, batch_size=2, shuffle=True, seed=11, **kw)


def _assert_batch_equal(a, b):
    assert a["fname"] == b["fname"]
    np.testing.assert_array_equal(a["slice_idx"], b["slice_idx"])
    np.testing.assert_array_equal(a["acceleration"], b["acceleration"])
    for k in ("masked_kspace", "sensitivity_maps", "mask", "target"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=0)


def test_device_cache_epochs_match_uncached(dataset_dir):
    plain = _loader(dataset_dir)
    cached = DeviceDatasetCache(_loader(dataset_dir), exclude=("kspace",))
    assert loader_is_epoch_static(cached.loader)
    for epoch in range(3):
        pa = list(plain)
        ca = list(cached)
        assert len(pa) == len(ca)
        for a, b in zip(pa, ca):
            _assert_batch_equal(a, b)
    # epoch >= 2 batches must not carry the excluded leaf
    assert "kspace" not in ca[0]


def test_device_cache_with_drop_last_fetches_missing(dataset_dir):
    # 6 samples, batch 4, drop_last: epoch 1 sees only 4 -> epoch 2 must
    # lazily fetch the remainder rather than serving zeros
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=_make_tfm())
    plain = BatchLoader(ds, batch_size=4, shuffle=True, seed=3, drop_last=True)
    ds2 = ReconstructionMRIDataset(root=dataset_dir, transform=_make_tfm())
    cached = DeviceDatasetCache(
        BatchLoader(ds2, batch_size=4, shuffle=True, seed=3, drop_last=True), exclude=("kspace",)
    )
    for epoch in range(3):
        for a, b in zip(plain, cached):
            _assert_batch_equal(a, b)


def test_device_cache_bf16_storage_gathers_f32(dataset_dir):
    import jax.numpy as jnp

    ds = ReconstructionMRIDataset(root=dataset_dir, transform=_make_tfm())
    loader = BatchLoader(ds, batch_size=2, shuffle=False, transfer_dtype="bfloat16")
    cached = DeviceDatasetCache(loader, exclude=("kspace",))
    e1 = list(cached)
    e2 = list(cached)
    for a, b in zip(e1, e2):
        for k in ("masked_kspace", "sensitivity_maps"):
            assert jnp.asarray(b[k]).dtype == jnp.float32  # uniform avals
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32)
            )


def test_device_cache_budget_guard_passthrough(dataset_dir):
    cached = DeviceDatasetCache(_loader(dataset_dir), exclude=("kspace",), max_bytes=1024)
    e1 = list(cached)
    assert cached._disabled
    e2 = list(cached)  # falls back to the host pipeline transparently
    plain = _loader(dataset_dir)
    list(plain)
    for a, b in zip(plain, e2):
        _assert_batch_equal(a, b)


def test_device_cache_shape_mismatch_disables_transparently(dataset_dir, tmp_path):
    # heterogeneous per-batch padding (no fixed pad_shape): a batch whose
    # padded leaf shapes disagree with the residents must disable the cache
    # and fall back, not crash the scatter
    from fixtures import create_dataset

    create_dataset(tmp_path, n_files=1, slices=3, coils=4, h=72, w=72)
    create_dataset(tmp_path / "b", n_files=1, slices=3, coils=4, h=64, w=64)
    import shutil

    for f in (tmp_path / "b").glob("*.h5"):
        shutil.move(str(f), tmp_path / ("small_" + f.name))
    shutil.rmtree(tmp_path / "b")
    ds = ReconstructionMRIDataset(root=tmp_path, transform=_make_tfm())
    cached = DeviceDatasetCache(
        BatchLoader(ds, batch_size=3, shuffle=False), exclude=("kspace",)
    )
    e1 = list(cached)
    assert cached._disabled and not cached._resident
    e2 = list(cached)  # transparent host-pipeline fallback
    plain = BatchLoader(
        ReconstructionMRIDataset(root=tmp_path, transform=_make_tfm()),
        batch_size=3,
        shuffle=False,
    )
    for a, b in zip(plain, e2):
        _assert_batch_equal(a, b)


def test_factory_knobs(dataset_dir):
    loader = build_dataloader(
        {
            "data_path": str(dataset_dir),
            "batch_size": 2,
            "shuffle": True,
            "cache_dataset": "memory",
            "device_cache_dataset": True,
            "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
            "fft_centered": True,
            "fft_normalization": "ortho",
        }
    )
    assert isinstance(loader, DeviceDatasetCache)
    assert isinstance(loader.dataset, CachedDataset)
    batches = list(loader)
    assert batches and "sample_indices" in batches[0]
    # non-deterministic config refuses both caches
    loader2 = build_dataloader(
        {
            "data_path": str(dataset_dir),
            "batch_size": 2,
            "use_seed": False,
            "cache_dataset": "memory",
            "device_cache_dataset": True,
            "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
        }
    )
    assert not isinstance(loader2, DeviceDatasetCache)
