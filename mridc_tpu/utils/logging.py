"""Process-rank-aware logging (reference: mridc/utils/mridc_logging.py:31
singleton Logger with rank-prefixed records; here a stdlib logger keyed by
``jax.process_index()``)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

__all__ = ["get_logger", "add_file_handler", "is_global_rank_zero"]

_LOGGER: Optional[logging.Logger] = None


def is_global_rank_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "mridc_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0
        fmt = f"[mridc_tpu rank{rank}] %(asctime)s %(levelname)s: %(message)s"
        handler.setFormatter(logging.Formatter(fmt, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    _LOGGER = logger
    return logger


def add_file_handler(log_dir, filename: Optional[str] = None):
    """Per-process log file like the reference's
    ``mridc_log_globalrank-N_localrank-M.txt`` (exp_manager.py:314-316)."""
    logger = get_logger()
    try:
        import jax

        rank = jax.process_index()
    except Exception:
        rank = 0
    filename = filename or f"mridc_tpu_log_globalrank-{rank}.txt"
    path = Path(log_dir) / filename
    path.parent.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s: %(message)s"))
    logger.addHandler(handler)
    return path
