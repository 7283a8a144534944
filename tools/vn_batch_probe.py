"""E2EVN inference batch sweep on the live chip.

The round-5 headline (216 slices/s) was measured at batch 96 after a
32/64/96 sweep; this probe extends the sweep upward (128/160) to check
whether the lane-starved 18-channel NormUnet convs keep gaining from
batch-side MXU occupancy, and prints slices/s + executed-flops MFU per
batch so bench.py's BENCH_VN_BATCH default can follow the winner.

Usage: python tools/vn_batch_probe.py [batches...]   (default: 96 128 160)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import ITERS, WARMUP, e2evn_flops_per_slice, make_e2evn_forward, time_scalar_fn

PEAK_TFLOPS = 197.0  # v5e bf16


def probe(batch: int) -> float:
    forward, fargs = make_e2evn_forward(batch)
    t0 = time.perf_counter()
    dt = time_scalar_fn(forward, fargs, WARMUP, ITERS)
    sps = (ITERS * batch) / dt
    tflops = e2evn_flops_per_slice("psf1d") * sps / 1e12
    print(
        f"batch {batch:4d}: {sps:8.2f} slices/s  exec-MFU {tflops / PEAK_TFLOPS:.3f} "
        f"(model-MFU {e2evn_flops_per_slice('full') * sps / 1e12 / PEAK_TFLOPS:.3f}) "
        f"[{time.perf_counter() - t0:.0f}s incl. compile]",
        flush=True,
    )
    return sps


if __name__ == "__main__":
    batches = [int(b) for b in sys.argv[1:]] or [96, 128, 160]
    best = max(batches, key=probe)
    print(f"best batch: {best}")
