"""Perf lab: one-off TPU measurements for the flagship CIRIM paths.

Reuses bench.py's config/data/train-step/quality builders so numbers are
comparable with the driver bench. Each subcommand prints one JSON line.

Usage:
  python tools/perf_lab.py infer [--batch 96] [--dc-dtype float32|bfloat16]
  python tools/perf_lab.py quality [--dc-dtype float32|bfloat16]
  python tools/perf_lab.py train [--batch 24] [--iters 5] [--set key=json ...]
  python tools/perf_lab.py trace-train [--batch 24] [--out /tmp/trace]
  python tools/perf_lab.py trace-infer [--batch 96] [--out /tmp/trace_infer]

--dc-dtype overrides infer_dc_dtype; left unset, the model default applies
(= compute_dtype, i.e. bfloat16 for the flagship config) and the JSON line
reports the effective value. Use --dc-dtype float32 for the f32-DC baseline.

Run on the real chip (default platform) unless JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def _infer_overrides(args):
    """The --dc-dtype flag as flagship_cfg overrides + the effective DC dtype.
    Single home of the None-means-f32 encoding, shared by infer/quality/trace."""
    overrides = {}
    if args.dc_dtype:
        overrides["infer_dc_dtype"] = None if args.dc_dtype == "float32" else args.dc_dtype
    cfg = bench.flagship_cfg(**overrides)
    effective = cfg.get("infer_dc_dtype", cfg["compute_dtype"]) or "float32"
    return overrides, effective


def run_infer(args):
    overrides, dc_dtype = _infer_overrides(args)
    forward, fargs = bench.make_flagship_forward(args.batch, overrides)
    dt = bench.time_scalar_fn(forward, fargs, warmup=2, iters=args.iters)
    print(json.dumps({"exp": "infer", "batch": args.batch, "dc_dtype": dc_dtype,
                      "slices_per_s": round(args.iters * args.batch / dt, 2)}))


def run_quality(args):
    overrides, dc_dtype = _infer_overrides(args)
    q = bench.quality_vs_exact(overrides)
    print(json.dumps({"exp": "quality", "dc_dtype": dc_dtype,
                      "ssim_vs_f32": round(q["ssim_vs_f32"], 6),
                      "rel_l2": round(q["rel_l2"], 6)}))


def _train_overrides(args):
    overrides = {}
    for k in (args.set or []):
        key, _, val = k.partition("=")
        try:
            val = json.loads(val)
        except Exception:
            pass
        overrides[key] = val
    return overrides


def run_train(args):
    train_step, params, opt_state, data = bench.make_flagship_train_step(
        args.batch, _train_overrides(args)
    )
    for _ in range(2):
        params, opt_state, loss = train_step(params, opt_state, *data)
        float(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, loss = train_step(params, opt_state, *data)
        float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({"exp": "train", "batch": args.batch, "set": args.set,
                      "slices_per_s": round(args.iters * args.batch / dt, 2),
                      "s_per_step": round(dt / args.iters, 3)}))


def run_trace_infer(args):
    import jax

    overrides, dc_dtype = _infer_overrides(args)
    forward, fargs = bench.make_flagship_forward(args.batch, overrides)
    for _ in range(2):
        float(forward(*fargs))
    jax.profiler.start_trace(args.out)
    for _ in range(2):
        float(forward(*fargs))
    jax.profiler.stop_trace()
    print(json.dumps({"exp": "trace-infer", "dc_dtype": dc_dtype, "out": args.out}))


def run_trace_train(args):
    import jax

    train_step, params, opt_state, data = bench.make_flagship_train_step(
        args.batch, _train_overrides(args)
    )
    for _ in range(2):
        params, opt_state, loss = train_step(params, opt_state, *data)
        float(loss)
    jax.profiler.start_trace(args.out)
    for _ in range(2):
        params, opt_state, loss = train_step(params, opt_state, *data)
        float(loss)
    jax.profiler.stop_trace()
    print(json.dumps({"exp": "trace-train", "out": args.out}))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("infer")
    pi.add_argument("--batch", type=int, default=96)
    pi.add_argument("--iters", type=int, default=7)
    pi.add_argument("--dc-dtype", default=None, choices=["float32", "bfloat16"])
    pq = sub.add_parser("quality")
    pq.add_argument("--dc-dtype", default=None, choices=["float32", "bfloat16"])
    pt = sub.add_parser("train")
    pt.add_argument("--batch", type=int, default=24)
    pt.add_argument("--iters", type=int, default=5)
    pt.add_argument("--set", action="append", help="cfg override key=json")
    pr = sub.add_parser("trace-train")
    pr.add_argument("--batch", type=int, default=24)
    pr.add_argument("--out", default="/tmp/mridc_trace")
    pr.add_argument("--set", action="append")
    pf = sub.add_parser("trace-infer")
    pf.add_argument("--batch", type=int, default=96)
    pf.add_argument("--out", default="/tmp/mridc_trace_infer")
    pf.add_argument("--dc-dtype", default=None, choices=["float32", "bfloat16"])
    args = p.parse_args()
    {"infer": run_infer, "quality": run_quality, "train": run_train,
     "trace-train": run_trace_train, "trace-infer": run_trace_infer}[args.cmd](args)


if __name__ == "__main__":
    main()
