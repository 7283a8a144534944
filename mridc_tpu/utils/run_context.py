"""Run context: the explicit replacement for the reference's AppState singleton.

The reference keeps a thread-safe global singleton with world/rank/model-parallel
fields and restore state (reference: mridc/utils/app_state.py:22-71). TPU-native
design passes an explicit, immutable-ish context instead: the `jax.sharding.Mesh`
IS the parallelism state, and process identity comes from `jax.process_index()`.
A module-level default is kept only as a convenience for logging/checkpoint code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

__all__ = ["RunContext", "get_run_context", "set_run_context", "is_global_rank_zero"]


def is_global_rank_zero() -> bool:
    # delegate to the backend-init-safe probe (utils/logging._rank): calling
    # jax.process_index() here before jax.distributed.initialize() would lock
    # the backend single-process and make every host report rank 0
    from mridc_tpu.utils.logging import is_global_rank_zero as _izr

    return _izr()


@dataclass
class RunContext:
    mesh: Optional[Any] = None  # jax.sharding.Mesh
    log_dir: Optional[Path] = None
    exp_dir: Optional[Path] = None
    checkpoint_dir: Optional[Path] = None
    exp_name: Optional[str] = None
    restore_path: Optional[Path] = None
    is_model_being_restored: bool = False
    extras: Dict[str, Any] = field(default_factory=dict)

    @property
    def world_size(self) -> int:
        try:
            import jax

            return jax.device_count()
        except Exception:
            return 1

    @property
    def process_index(self) -> int:
        # backend-init-safe: env-derived rank until the backend is up
        from mridc_tpu.utils.logging import _rank

        return _rank()

    @property
    def data_parallel_size(self) -> int:
        if self.mesh is not None and "data" in self.mesh.shape:
            return self.mesh.shape["data"]
        return self.world_size


_DEFAULT: Optional[RunContext] = None


def get_run_context() -> RunContext:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = RunContext()
    return _DEFAULT


def set_run_context(ctx: RunContext):
    global _DEFAULT
    _DEFAULT = ctx
