"""Multi-host (multi-process) data sharding and metric reduction.

The reference gets per-worker dataset sharding from PTL's DistributedSampler
and sums val/test metrics across workers with DistributedMetricSum
(reference: mridc/collections/common/nn/base.py:26-62, metric aggregation at
reconstruction/nn/base.py:890-913). On TPU slices the analogue is
`jax.process_index()/process_count()`-strided example lists plus a host
all-gather of (sum, count) pairs:

  - sharding is deterministic and padded to equal per-process length (like
    DistributedSampler: wrap-around padding) so every host runs the same
    number of jitted steps — required for SPMD collectives not to deadlock.
  - reduction rides `multihost_utils.process_allgather` (a tiny transfer);
    on a single process both are no-ops.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import numpy as np

__all__ = ["process_info", "shard_indices", "all_sum_scalars", "reduce_mean_stats"]


def process_info() -> tuple:
    """(process_index, process_count); (0, 1) when not distributed."""
    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # backend not initialized yet
        return 0, 1


def shard_indices(n: int, process_index: int, process_count: int) -> np.ndarray:
    """Disjoint, equal-length index shard for this process.

    Pads the index list to a multiple of process_count by wrapping around
    (torch DistributedSampler semantics) so each process sees the same number
    of examples; strided assignment keeps shards disjoint for the unpadded
    prefix.
    """
    if process_count <= 1:
        return np.arange(n)
    total = ((n + process_count - 1) // process_count) * process_count
    idx = np.arange(total) % max(n, 1)
    return idx[process_index::process_count]


def all_sum_scalars(values: Dict[str, float]) -> Dict[str, float]:
    """Sum a dict of scalars across all processes (identity on 1 process)."""
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    # guard: values are paired positionally after the sort, so every process
    # must report the SAME key set — a mismatch would silently sum unrelated
    # metrics into each other
    import zlib

    key_sig = np.asarray([len(keys), zlib.crc32(",".join(keys).encode())], np.int64)
    sigs = np.asarray(multihost_utils.process_allgather(key_sig))
    if not (sigs == sigs[0]).all():
        raise ValueError(
            f"all_sum_scalars: metric key sets differ across processes (local keys: {keys})"
        )
    local = np.asarray([float(values[k]) for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    summed = gathered.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}


def reduce_mean_stats(sums: Dict[str, float], counts: Dict[str, float]) -> Dict[str, float]:
    """Cross-process mean of per-key (sum, count) pairs.

    Keys of ``sums`` and ``counts`` must match; returns sum/count after
    all-reducing both (reference DistributedMetricSum divides the summed
    metric by the summed number of volumes, nn/base.py:890-913).
    """
    merged = {f"s:{k}": v for k, v in sums.items()}
    merged.update({f"n:{k}": float(counts[k]) for k in sums})
    red = all_sum_scalars(merged)
    return {k: red[f"s:{k}"] / max(red[f"n:{k}"], 1.0) for k in sums}
