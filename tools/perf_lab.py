"""Perf lab: one-off TPU measurements for the flagship CIRIM paths.

Reuses bench.py's config/data/train-step/quality builders so numbers are
comparable with the driver bench. Each subcommand prints one JSON line.

Usage:
  python tools/perf_lab.py infer [--batch 96] [--dc-dtype float32|bfloat16]
  python tools/perf_lab.py quality [--dc-dtype float32|bfloat16]
  python tools/perf_lab.py train [--batch 24] [--iters 5] [--set key=json ...]
  python tools/perf_lab.py trace-train [--batch 24] [--out /tmp/trace]
  python tools/perf_lab.py trace-infer [--batch 96] [--out /tmp/trace_infer]
  python tools/perf_lab.py zoo --cfg '{"model_name": "MTLRS", ...}' \
      [--batch 8] [--iters 5]      # any recon/multitask model, k-space in
  python tools/perf_lab.py seg --cfg '{"model_name": "SEGMENTATIONUNET"}' \
      [--batch 64] [--train]       # segmentation trunks, image in

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


def run_zoo(args):
    """Inference throughput for any recon/multitask registry model on the
    flagship bench data shapes (15 coils, 320x320). Multitask models return
    (ModelOutput, seg) — both are reduced into the timed scalar."""
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model

    cfg = json.loads(args.cfg)
    model = build_model(cfg)
    name = str(cfg.get("model_name", "")).upper()
    if name in ("QCIRIM", "QRIM", "QVN", "QVARNET"):
        # quantitative signature: (y[B,E,C,H,W,2], sens, mask, maps_init, tes)
        import numpy as np

        rng = np.random.default_rng(0)
        e = int(cfg.get("num_echoes", 4))
        b, c, h, w = args.batch, bench.COILS, bench.H, bench.W
        y = jnp.asarray(rng.standard_normal((b, e, c, h, w, 2)).astype(np.float32))
        sens_np = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
        sens_np /= np.sqrt((sens_np**2).sum(-1, keepdims=True).sum(1, keepdims=True))
        sens = jnp.asarray(sens_np)
        mask_np = np.zeros((b, 1, h, w), np.float32)
        mask_np[..., ::4] = 1.0
        mask_np[..., w // 2 - 16 : w // 2 + 16] = 1.0
        mask = jnp.asarray(mask_np)
        maps_init = jnp.asarray(np.abs(rng.standard_normal((b, h, w, 4))).astype(np.float32))
        tes = jnp.asarray([3.0, 11.5, 20.0, 28.5][:e], jnp.float32)
        fargs = (y, sens, mask, maps_init, tes)
    else:
        y, sens, mask = (jnp.asarray(x) for x in bench._data(args.batch))
        fargs = (y, sens, mask)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *fargs)

    @jax.jit
    def forward(variables, *fargs):
        out = model.apply(variables, *fargs)
        if isinstance(out, tuple):  # multitask: (ModelOutput, seg)
            return (out[0].prediction ** 2).sum() + (out[1] ** 2).sum()
        return (out.prediction ** 2).sum()

    dt = bench.time_scalar_fn(forward, (variables, *fargs), warmup=2, iters=args.iters)
    print(json.dumps({"exp": "zoo", "model": cfg.get("model_name"), "batch": args.batch,
                      "slices_per_s": round(args.iters * args.batch / dt, 2)}))


def run_seg(args):
    """Segmentation-trunk throughput at 320x320 (2-channel input). --train
    times fwd+bwd of an MSE surrogate instead of the forward."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model

    cfg = {"segmentation_module_output_channels": 2, **json.loads(args.cfg)}
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 320, 320, 2)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    if args.train:
        tgt = jnp.asarray((rng.random((args.batch, 320, 320, 2)) > 0.5).astype(np.float32))

        @jax.jit
        def fn(params, x, tgt):
            def loss(p):
                # dropout-bearing trunks (VNet) need a PRNG in train mode;
                # a fixed key keeps the timing deterministic
                out = model.apply(
                    {"params": p}, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)}
                )
                return ((out - tgt) ** 2).mean()
            l, g = jax.value_and_grad(loss)(params)
            return l + sum(jnp.sum(jnp.abs(v)) for v in jax.tree_util.tree_leaves(g)) * 0.0
        fargs = (variables["params"], x, tgt)
    else:
        @jax.jit
        def fn(variables, x):
            return (model.apply(variables, x) ** 2).sum()
        fargs = (variables, x)

    dt = bench.time_scalar_fn(fn, fargs, warmup=2, iters=args.iters)
    print(json.dumps({"exp": "seg-train" if args.train else "seg-infer",
                      "model": cfg.get("model_name"), "batch": args.batch,
                      "slices_per_s": round(args.iters * args.batch / dt, 2)}))


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
    pz = sub.add_parser("zoo")
    pz.add_argument("--cfg", required=True, help="model config as JSON")
    pz.add_argument("--batch", type=int, default=8)
    pz.add_argument("--iters", type=int, default=5)
    ps = sub.add_parser("seg")
    ps.add_argument("--cfg", required=True, help="model config as JSON")
    ps.add_argument("--batch", type=int, default=64)
    ps.add_argument("--iters", type=int, default=5)
    ps.add_argument("--train", action="store_true")
    args = p.parse_args()
    {"infer": run_infer, "quality": run_quality, "train": run_train,
     "trace-train": run_trace_train, "trace-infer": run_trace_infer,
     "zoo": run_zoo, "seg": run_seg}[args.cmd](args)


if __name__ == "__main__":
    main()
