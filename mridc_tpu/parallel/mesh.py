"""Device-mesh helpers: the TPU-native replacement for the reference's
torch.distributed/NCCL plumbing (reference: mridc/utils/distributed.py:13-52,
AppState parallel fields mridc/utils/app_state.py:45-52).

There is no process-group code to port — a `jax.sharding.Mesh` with a ``data``
axis *is* the data-parallel strategy; gradient reduction is inserted by XLA
from the sharding annotations and rides ICI. Extra axes (``model``, ``slice``)
are reserved so tensor/slice parallelism can be layered on without API change.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "data_parallel_shardings"]


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """1D data mesh by default; pass shape+axis_names for hybrid layouts.
    With an explicit ``shape``, the device count is prod(shape)."""
    devices = jax.devices()
    if shape is not None:
        n = int(np.prod(shape))
        if num_devices is not None and num_devices != n:
            raise ValueError(f"num_devices={num_devices} inconsistent with shape {shape} (prod={n})")
    else:
        n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    devices = devices[:n]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Leaves whose dim0 is NOT a batch axis: per-echo/scalar metadata shared by
# every sample. They are replicated by declaration, not by the
# divisibility-warning fallback (e.g. "TEs" is [num_echoes] echo times —
# reference quantitative/nn/base.py threads it alongside the batch).
NON_BATCH_LEAVES = frozenset({"TEs", "acceleration_choices", "attrs"})


def shard_batch(
    batch: Dict,
    mesh: Mesh,
    axis: str = "data",
    replicated_keys: frozenset = NON_BATCH_LEAVES,
) -> Dict:
    """Device-put every array leaf with its batch axis sharded over ``axis``.

    Leaves named in ``replicated_keys`` are replicated silently (their dim0 is
    semantically not a batch axis). Non-array leaves (fnames, attrs) pass
    through untouched for host use.
    """
    import logging

    sharding = batch_sharding(mesh, axis)
    out = {}
    for k, v in batch.items():
        is_array = isinstance(v, (np.ndarray, jax.Array))
        if is_array and k in replicated_keys:
            out[k] = jax.device_put(v, replicated(mesh))
        elif is_array and v.ndim >= 1 and v.shape[0] % mesh.shape[axis] == 0:
            out[k] = jax.device_put(v, sharding)
        elif is_array:
            if not _warned_replicated.get(k):
                _warned_replicated[k] = True
                logging.getLogger("mridc_tpu").warning(
                    f"batch leaf {k!r} (dim0={v.shape[0] if v.ndim else 0}) is not divisible by the "
                    f"{axis}-axis size {mesh.shape[axis]}: replicating (every device computes the full "
                    "batch). Use drop_last or a divisible batch size."
                )
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = v
    return out


_warned_replicated: Dict[str, bool] = {}


def data_parallel_shardings(mesh: Mesh):
    """(replicated_params, batch_sharded) pair for jit in/out shardings."""
    return replicated(mesh), batch_sharding(mesh)
