"""Background prefetching for the host-side batch loaders.

Reference parity: the reference wraps every dataset in a torch ``DataLoader``
with ``num_workers``/``pin_memory`` from config
(mridc/collections/reconstruction/nn/base.py:1083-1090), overlapping h5 I/O +
the numpy transform pipeline with the training step. TPU-first equivalent:

  - ``Prefetcher`` — a daemon producer thread runs the wrapped loader's
    ``__iter__`` and fills a bounded queue, so batch ``k+1``..``k+depth`` are
    built while the device executes step ``k``. Batch ORDER is exactly the
    wrapped loader's order (single producer, FIFO queue), so epoch
    determinism is untouched.
  - ``BatchLoader(num_workers=N)`` (see loaders.py) — threads map
    ``dataset[i]`` over the epoch order with a bounded in-flight window,
    yielding samples IN ORDER; h5py holds a global lock but the numpy
    transform pipeline releases the GIL in its hot ops, so threads (not
    processes) recover most of the win without pickling device-sized arrays.

Threads (not subprocesses) are the right grain here: one sample is a
~100 MB multicoil slice; torch's worker processes exist to dodge the GIL for
Python-heavy transforms, but this pipeline is numpy/BLAS-bound.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

__all__ = ["Prefetcher", "DevicePrefetcher", "OrderedWorkerMap"]

_SENTINEL = object()


class _Raise:
    """Wraps a producer-side exception so the consumer re-raises it."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class Prefetcher:
    """Iterate ``loader`` on a background thread, ``depth`` batches ahead.

    Transparent wrapper: ``len``, ``dataset``, ``batch_size`` etc. pass
    through, so trainers that introspect the loader keep working. Each
    ``__iter__`` spawns a fresh producer thread; abandoning the iterator
    (break / GC) stops the producer promptly via a stop event.
    """

    def __init__(self, loader: Iterable, depth: int = 2):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self.loader = loader
        self.depth = int(depth)

    def __getattr__(self, name):
        return getattr(self.loader, name)

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def put_until_stopped(item) -> bool:
            """Block until the item is enqueued or the consumer abandoned the
            iterator. Terminal items (exception/sentinel) MUST use this too: a
            bounded-timeout put could drop them while the consumer is merely
            slow (a >5s device step), leaving it blocked on q.get() forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for batch in self.loader:
                    if not put_until_stopped(batch):
                        return
            except BaseException as exc:  # noqa: BLE001 — forwarded to consumer
                put_until_stopped(_Raise(exc))
                return
            put_until_stopped(_SENTINEL)

        thread = threading.Thread(target=produce, name="mridc-prefetch", daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, _Raise):
                    raise item.exc
                yield item
        finally:
            stop.set()


# the batch leaves worth shipping ahead of the step: the multicoil real-view
# tensors dominate batch bytes (a [24, 15, 320, 320, 2] f32 pair is ~1.2 GB);
# 'mask' stays host-side — trainers reshape/broadcast it with numpy first
DEVICE_PREFETCH_KEYS = (
    "kspace",
    "masked_kspace",
    "sensitivity_maps",
    "target",
    "initial_prediction",
    "n2r_masked_kspace",
)


class DevicePrefetcher:
    """Prefetch batches TO THE DEVICE ``depth`` steps ahead.

    The producer thread pulls batches from the wrapped loader and issues the
    host->device transfer of the heavy array leaves (``keys``) while the
    device executes the current step — the JAX analogue of flax's
    ``prefetch_to_device``, generalized to dict batches. On hosts where the
    interconnect is the bottleneck (PCIe, or axon's tunnel) this hides up to
    one full step of compute behind the transfer; it never changes batch
    order or values.

    ``put`` overrides the transfer (e.g. ``lambda x: jax.device_put(x,
    sharding)`` to place a multi-chip layout directly); default is
    ``jnp.asarray`` to the default device. Trainers that re-``device_put``
    with an explicit sharding afterwards are unaffected: re-putting an
    already-on-device array is a device-side relayout, not a second host
    transfer.
    """

    def __init__(self, loader: Iterable, depth: int = 2, keys=DEVICE_PREFETCH_KEYS, put=None):
        if depth < 1:
            raise ValueError(f"device prefetch depth must be >= 1, got {depth}")
        self.loader = loader
        self.depth = int(depth)
        self.keys = tuple(keys)
        self.put = put

    def __getattr__(self, name):
        return getattr(self.loader, name)

    def __len__(self):
        return len(self.loader)

    def _transfer(self, batch):
        put = self.put
        if put is None:
            import jax.numpy as jnp

            put = jnp.asarray
        if not isinstance(batch, dict):
            return put(batch)
        out = dict(batch)
        for k in self.keys:
            if k in out and out[k] is not None:
                out[k] = put(out[k])
        return out

    def __iter__(self) -> Iterator:
        inner = (self._transfer(b) for b in self.loader)
        # reuse Prefetcher's producer/queue machinery: the transfer happens on
        # the producer thread, 'depth' batches ahead of the consumer
        yield from Prefetcher(_IterOnce(inner), depth=self.depth)


class _IterOnce:
    """Adapts a generator to the Iterable contract Prefetcher expects."""

    def __init__(self, gen):
        self._gen = gen

    def __iter__(self):
        return self._gen


class OrderedWorkerMap:
    """Map ``fn`` over ``items`` with ``num_workers`` threads, yielding results
    in input order with at most ``num_workers + extra`` tasks in flight.

    The bounded window keeps memory at O(window × sample) instead of
    materializing the whole epoch.
    """

    def __init__(self, fn, items, num_workers: int, extra: Optional[int] = None):
        self.fn = fn
        self.items = list(items)
        self.num_workers = int(num_workers)
        self.window = self.num_workers + (self.num_workers if extra is None else int(extra))

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers, thread_name_prefix="mridc-worker") as ex:
            futures = []
            it = iter(self.items)
            exhausted = False
            while True:
                while not exhausted and len(futures) < self.window:
                    try:
                        item = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    futures.append(ex.submit(self.fn, item))
                if not futures:
                    return
                yield futures.pop(0).result()
