"""Process-rank-aware logging (reference: mridc/utils/mridc_logging.py:31
singleton Logger with rank-prefixed records; here a stdlib logger keyed by
``jax.process_index()``).

The rank probe NEVER initializes the JAX backend: reading
``jax.process_index()`` before ``jax.distributed.initialize()`` would lock
the backend into single-process mode (every host would then believe it is
rank 0 and share log/checkpoint dirs). Before the backend exists, the rank
comes from the standard cluster env vars; the log prefix re-evaluates per
record, so it becomes correct once distributed init runs.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from typing import Dict, Optional

__all__ = ["get_logger", "add_file_handler", "is_global_rank_zero"]

_LOGGERS: Dict[str, logging.Logger] = {}
_FILE_HANDLERS: Dict[str, logging.Handler] = {}


def _rank() -> int:
    """Current process rank WITHOUT forcing JAX backend initialization."""
    try:
        import jax
        from jax._src import xla_bridge

        if xla_bridge._backends:  # backend already up: the authoritative answer
            return int(jax.process_index())
    except Exception:
        pass
    for var in ("JAX_PROCESS_ID", "SLURM_PROCID", "RANK", "CLOUD_TPU_TASK_ID"):
        val = os.environ.get(var)
        if val is not None:
            try:
                return int(val)
            except ValueError:
                continue
    return 0


def is_global_rank_zero() -> bool:
    return _rank() == 0


class _RankFilter(logging.Filter):
    """Injects the CURRENT rank into every record (cheap once the backend is
    up; env-derived before), so early-imported loggers don't bake in rank 0."""

    def filter(self, record: logging.LogRecord) -> bool:
        record.rank = _rank()
        return True


def get_logger(name: str = "mridc_tpu") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        fmt = "[%(name)s rank%(rank)s] %(asctime)s %(levelname)s: %(message)s"
        handler.setFormatter(logging.Formatter(fmt, datefmt="%H:%M:%S"))
        handler.addFilter(_RankFilter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    _LOGGERS[name] = logger
    return logger


def add_file_handler(log_dir, filename: Optional[str] = None):
    """Per-process log file like the reference's
    ``mridc_log_globalrank-N_localrank-M.txt`` (exp_manager.py:314-316).
    One live file handler per target path: re-invocations (resumed runs, a
    second ExpManager in the same process) close and replace the previous
    handler for that path instead of multiplying appenders."""
    logger = get_logger()
    filename = filename or f"mridc_tpu_log_globalrank-{_rank()}.txt"
    path = Path(log_dir) / filename
    path.parent.mkdir(parents=True, exist_ok=True)
    key = str(path)
    old = _FILE_HANDLERS.pop(key, None)
    if old is not None:
        logger.removeHandler(old)
        old.close()
    # a new run dir supersedes any previous run's file handler in this process
    for prev_key in list(_FILE_HANDLERS):
        prev = _FILE_HANDLERS.pop(prev_key)
        logger.removeHandler(prev)
        prev.close()
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s: %(message)s"))
    logger.addHandler(handler)
    _FILE_HANDLERS[key] = handler
    return path
