"""Named timers with device synchronization.

Functional parity with reference: mridc/utils/timers.py:14 ``NamedTimer`` —
named start/stop accumulators with an optional sliding buffer; CUDA sync is
replaced by ``jax.block_until_ready`` on a probe (note: on some TPU transports
block_until_ready is a no-op, so callers timing device work should read back a
scalar — see mridc_tpu/../bench.py).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, Optional

__all__ = ["NamedTimer"]


class NamedTimer:
    def __init__(self, reduction: str = "mean", sync_device: bool = False, buffer_size: int = -1):
        self.reduction = reduction
        self.sync_device = sync_device
        self.buffer_size = buffer_size
        self.reset()

    def reset(self, name: Optional[str] = None):
        if name is None:
            self.timers: Dict[str, Dict] = {}
        else:
            self.timers.pop(name, None)

    def _maybe_sync(self, probe=None):
        if self.sync_device:
            try:
                import jax

                jax.block_until_ready(probe) if probe is not None else jax.effects_barrier()
            except Exception:
                pass

    def start(self, name: str = ""):
        timer = self.timers.get(name, {})
        if "start" in timer:
            raise RuntimeError(f"Timer = {name} was started twice without stop")
        self._maybe_sync()
        timer["start"] = time.perf_counter()
        self.timers[name] = timer

    def stop(self, name: str = "", probe=None):
        timer = self.timers.get(name)
        if timer is None or "start" not in timer:
            raise RuntimeError(f"Timer = {name} was stopped before start")
        self._maybe_sync(probe)
        dt = time.perf_counter() - timer.pop("start")
        if self.buffer_size > 0:
            timer.setdefault("buffer", deque(maxlen=self.buffer_size)).append(dt)
        else:
            timer["total"] = timer.get("total", 0.0) + dt
            timer["count"] = timer.get("count", 0) + 1
            timer["max"] = max(timer.get("max", dt), dt)
            timer["min"] = min(timer.get("min", dt), dt)

    def get(self, name: str = "") -> float:
        timer = self.timers.get(name, {})
        if self.buffer_size > 0:
            buf = timer.get("buffer", [])
            if not buf:
                return 0.0
            vals = list(buf)
        else:
            if not timer.get("count"):
                return 0.0
            if self.reduction == "sum":
                return timer["total"]
            if self.reduction == "max":
                return timer["max"]
            if self.reduction == "min":
                return timer["min"]
            return timer["total"] / timer["count"]
        if self.reduction == "sum":
            return sum(vals)
        if self.reduction == "max":
            return max(vals)
        if self.reduction == "min":
            return min(vals)
        return sum(vals) / len(vals)

    @property
    def active_timers(self):
        return [k for k, v in self.timers.items() if "start" in v]

    def export(self) -> Dict[str, float]:
        return {k: self.get(k) for k in self.timers}
