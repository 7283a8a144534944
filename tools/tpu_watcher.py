"""Poll the axon TPU; the moment a tiny matmul succeeds, run the measurement
queue (tools/measure_queue.py) once and exit. Disarm before session end:
``kill $(cat /tmp/tpu_watcher.pid)``.

Probe is a subprocess so a wedged tunnel can't hang the watcher itself.
"""
import json
import os
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256,256), jnp.bfloat16);"
    "print('PROBE_OK', float((x@x).sum()))"
)
LOG = "/tmp/tpu_watcher.log"


def log(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


def probe() -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], capture_output=True, text=True, timeout=300)
        return r.returncode == 0 and "PROBE_OK" in (r.stdout or "")
    except subprocess.TimeoutExpired:
        return False


def main():
    with open("/tmp/tpu_watcher.pid", "w") as f:
        f.write(str(os.getpid()))
    interval = int(os.environ.get("TPU_WATCH_INTERVAL", "300"))
    log(f"armed (interval {interval}s)")
    while True:
        if probe():
            log("TPU is UP — running measure_queue")
            r = subprocess.run(
                [sys.executable, "tools/measure_queue.py"], cwd="/root/repo",
                capture_output=True, text=True, timeout=4 * 3600,
            )
            log(f"measure_queue rc={r.returncode}")
            log(json.dumps({"tail": (r.stdout or "").strip().splitlines()[-3:]}))
            return
        log("probe failed; TPU still down")
        time.sleep(interval)


if __name__ == "__main__":
    main()
