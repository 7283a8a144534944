"""Async data pipeline tests: Prefetcher + num_workers preserve epoch order,
determinism, and error propagation (reference analogue: torch DataLoader
num_workers, reconstruction/nn/base.py:1083-1090)."""

import threading
import time

import numpy as np
import pytest

from mridc_tpu.data.factory import build_dataloader, maybe_prefetch
from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
from mridc_tpu.data.prefetch import OrderedWorkerMap, Prefetcher
from mridc_tpu.data.transforms import MRIDataTransforms
from mridc_tpu.data.subsample import create_masker

from fixtures import create_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mock_prefetch")
    create_dataset(root, n_files=2, slices=3, coils=4, h=64, w=64)
    return root


def _make_loader(dataset_dir, **kw):
    tfm = MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.08], [4])],
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
        coil_combination_method="SENSE",
    )
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=tfm)
    return BatchLoader(ds, batch_size=2, shuffle=True, seed=7, **kw)


def _batch_key(batch):
    return [(f, int(s)) for f, s in zip(batch["fname"], batch["slice_idx"])]


def _assert_batches_equal(a, b):
    assert _batch_key(a) == _batch_key(b)
    for k in ("kspace", "masked_kspace", "sensitivity_maps", "mask", "target"):
        np.testing.assert_array_equal(a[k], b[k])


def test_prefetcher_preserves_order_and_values(dataset_dir):
    plain = list(_make_loader(dataset_dir))
    pre = list(Prefetcher(_make_loader(dataset_dir), depth=3))
    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        _assert_batches_equal(a, b)


def test_prefetcher_multiple_epochs_match(dataset_dir):
    # shuffle reshuffles per epoch; the prefetched stream must track it exactly
    plain_loader = _make_loader(dataset_dir)
    pre_loader = Prefetcher(_make_loader(dataset_dir), depth=2)
    for _ in range(3):
        for a, b in zip(plain_loader, pre_loader):
            _assert_batches_equal(a, b)


def test_num_workers_preserves_order_and_values(dataset_dir):
    plain = list(_make_loader(dataset_dir))
    threaded = list(_make_loader(dataset_dir, num_workers=3))
    assert len(plain) == len(threaded)
    for a, b in zip(plain, threaded):
        _assert_batches_equal(a, b)


def test_prefetcher_passthrough_attrs(dataset_dir):
    loader = _make_loader(dataset_dir)
    pre = Prefetcher(loader, depth=2)
    assert len(pre) == len(loader)
    assert pre.batch_size == 2
    assert pre.dataset is loader.dataset


def test_prefetcher_propagates_exception():
    class Boom:
        def __iter__(self):
            yield 1
            raise RuntimeError("producer blew up")

    it = iter(Prefetcher(Boom(), depth=2))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer blew up"):
        next(it)


def test_prefetcher_early_break_stops_producer():
    produced = []
    release = threading.Event()

    class Slow:
        def __iter__(self):
            for i in range(100):
                produced.append(i)
                yield i

    pre = Prefetcher(Slow(), depth=1)
    for x in pre:
        if x == 2:
            break
    del pre, release
    time.sleep(0.3)
    # producer runs at most depth + 1 items ahead of the last consumed one
    assert len(produced) <= 6


def test_prefetcher_runs_ahead():
    # while the consumer sleeps on batch 0, the producer must have built more
    produced = []

    class Tracked:
        def __iter__(self):
            for i in range(5):
                produced.append(i)
                yield i

    it = iter(Prefetcher(Tracked(), depth=3))
    next(it)
    deadline = time.time() + 5.0
    while len(produced) < 4 and time.time() < deadline:
        time.sleep(0.01)
    assert len(produced) >= 4  # 1 consumed + 3 queued
    for _ in range(4):
        next(it)


def test_ordered_worker_map_order_and_window():
    in_flight = []
    lock = threading.Lock()
    peak = [0]

    def work(i):
        with lock:
            in_flight.append(i)
            peak[0] = max(peak[0], len(in_flight))
        time.sleep(0.01)
        with lock:
            in_flight.remove(i)
        return i * i

    out = list(OrderedWorkerMap(work, range(40), num_workers=4))
    assert out == [i * i for i in range(40)]
    assert peak[0] <= 8  # window = 2 x num_workers


def test_ordered_worker_map_propagates_exception():
    def work(i):
        if i == 3:
            raise ValueError("bad sample")
        return i

    with pytest.raises(ValueError, match="bad sample"):
        list(OrderedWorkerMap(work, range(10), num_workers=2))


def test_factory_wires_num_workers_and_prefetch(dataset_dir):
    ds_cfg = {
        "data_path": str(dataset_dir),
        "batch_size": 2,
        "shuffle": True,
        "seed": 7,
        "num_workers": 2,
        "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    loader = build_dataloader(dict(ds_cfg))
    assert isinstance(loader, Prefetcher)
    assert loader.loader.num_workers == 2

    plain = build_dataloader({**ds_cfg, "num_workers": 0})
    assert isinstance(plain, BatchLoader)

    explicit = build_dataloader({**ds_cfg, "num_workers": 0, "prefetch_batches": 4})
    assert isinstance(explicit, Prefetcher) and explicit.depth == 4

    for a, b in zip(plain, loader):
        _assert_batches_equal(a, b)


def test_maybe_prefetch_disabled_by_default():
    sentinel = object()
    assert maybe_prefetch(sentinel, {}) is sentinel


def test_transfer_dtype_bf16_collate(dataset_dir):
    import ml_dtypes

    plain = list(_make_loader(dataset_dir))
    bf16 = list(_make_loader(dataset_dir, transfer_dtype="bfloat16"))
    assert len(plain) == len(bf16)
    for a, b in zip(plain, bf16):
        assert _batch_key(a) == _batch_key(b)
        for k in ("kspace", "masked_kspace", "sensitivity_maps"):
            assert b[k].dtype == np.dtype(ml_dtypes.bfloat16)
            # values are exactly the f32 leaves rounded to bf16
            np.testing.assert_array_equal(
                b[k].astype(np.float32), a[k].astype(ml_dtypes.bfloat16).astype(np.float32)
            )
        # loss-side leaves stay f32
        assert b["target"].dtype == np.float32
        assert b["mask"].dtype == np.float32


def test_transfer_dtype_rejects_unknown(dataset_dir):
    with pytest.raises(ValueError, match="transfer_dtype"):
        _make_loader(dataset_dir, transfer_dtype="float16")


def test_device_prefetcher_puts_heavy_leaves(dataset_dir):
    import jax

    from mridc_tpu.data.prefetch import DevicePrefetcher

    plain = list(_make_loader(dataset_dir))
    dev = list(DevicePrefetcher(Prefetcher(_make_loader(dataset_dir), depth=2), depth=2))
    assert len(plain) == len(dev)
    for a, b in zip(plain, dev):
        assert _batch_key(a) == _batch_key(b)
        for k in ("kspace", "masked_kspace", "sensitivity_maps", "target"):
            assert isinstance(b[k], jax.Array), k
            np.testing.assert_array_equal(np.asarray(b[k]), a[k])
        # mask stays host-side for numpy reshaping in trainers
        assert isinstance(b["mask"], np.ndarray)
        # non-array leaves pass through untouched
        assert b["fname"] == a["fname"]


def test_device_prefetcher_factory_knob(dataset_dir):
    from mridc_tpu.data.prefetch import DevicePrefetcher

    ds_cfg = {
        "data_path": str(dataset_dir),
        "batch_size": 2,
        "shuffle": True,
        "seed": 7,
        "num_workers": 2,
        "device_prefetch": True,
        "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    loader = build_dataloader(dict(ds_cfg))
    assert isinstance(loader, DevicePrefetcher)
    assert isinstance(loader.loader, Prefetcher)
    # attribute passthrough reaches the innermost BatchLoader
    assert loader.batch_size == 2


def test_device_prefetcher_propagates_exception():
    from mridc_tpu.data.prefetch import DevicePrefetcher

    class Boom:
        def __iter__(self):
            yield {"target": np.zeros((2, 4, 4, 2), np.float32)}
            raise ValueError("bad batch")

    it = iter(DevicePrefetcher(Boom(), depth=2))
    next(it)
    with pytest.raises(ValueError, match="bad batch"):
        next(it)
