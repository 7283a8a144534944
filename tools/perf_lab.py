"""Perf lab: one-off TPU measurements for the flagship CIRIM paths.

Reuses bench.py's model/data builders so numbers are comparable with the
driver bench. Each subcommand prints one JSON line.

Usage:
  python tools/perf_lab.py infer [--batch 96] [--dc-dtype bfloat16]
  python tools/perf_lab.py quality [--dc-dtype bfloat16]
  python tools/perf_lab.py train [--batch 24] [--iters 5]
  python tools/perf_lab.py trace-train [--batch 24] [--out /tmp/trace]

Run on the real chip (default platform) unless JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def base_cfg():
    return {
        "model_name": "CIRIM",
        "num_cascades": bench.CASCADES,
        "time_steps": bench.TIME_STEPS,
        "recurrent_layer": "IndRNN",
        "conv_filters": [bench.FILTERS, bench.FILTERS, 2],
        "conv_kernels": [5, 3, 3],
        "conv_dilations": [1, 2, 1],
        "recurrent_filters": [bench.FILTERS, bench.FILTERS, 0],
        "recurrent_kernels": [1, 1, 0],
        "recurrent_dilations": [1, 1, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
        "compute_dtype": "bfloat16",
        "stack_intermediates": False,
        "dc_mode": "psf1d",
    }


def run_infer(args):
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model

    cfg = base_cfg()
    if args.dc_dtype:
        cfg["infer_dc_dtype"] = args.dc_dtype
    model = build_model(cfg)
    y, sens, mask = (jnp.asarray(x) for x in bench._data(args.batch))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), y, sens, mask)

    @jax.jit
    def forward(variables, y, sens, mask):
        pred = model.apply(variables, y, sens, mask).prediction
        return (pred**2).sum()

    for _ in range(2):
        float(forward(variables, y, sens, mask))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(forward(variables, y, sens, mask))
    dt = time.perf_counter() - t0
    sps = args.iters * args.batch / dt
    print(json.dumps({"exp": "infer", "batch": args.batch, "dc_dtype": args.dc_dtype,
                      "slices_per_s": round(sps, 2)}))


def run_quality(args):
    import jax
    import jax.numpy as jnp

    from mridc_tpu.metrics.reconstruction import ssim
    from mridc_tpu.models import build_model

    cfg = base_cfg()
    fast_cfg = dict(cfg, lane_fold="always")
    if args.dc_dtype:
        fast_cfg["infer_dc_dtype"] = args.dc_dtype
    fast = build_model(fast_cfg)
    exact = build_model({**cfg, "compute_dtype": None, "dc_mode": "full", "lane_fold": "never"})
    y, sens, mask = (jnp.asarray(x) for x in bench._data(2))
    variables = jax.jit(exact.init)(jax.random.PRNGKey(0), y, sens, mask)
    p_fast = np.asarray(jax.jit(lambda v, a, s, m: fast.apply(v, a, s, m).prediction)(variables, y, sens, mask))
    p_ref = np.asarray(jax.jit(lambda v, a, s, m: exact.apply(v, a, s, m).prediction)(variables, y, sens, mask))

    def mag(x):
        m = np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
        return m / (m.max() or 1.0)

    rel = float(np.linalg.norm(p_fast - p_ref) / np.linalg.norm(p_ref))
    print(json.dumps({"exp": "quality", "dc_dtype": args.dc_dtype,
                      "ssim_vs_f32": round(float(ssim(mag(p_ref), mag(p_fast))), 6),
                      "rel_l2": round(rel, 6)}))


def make_train_step(args):
    import jax
    import jax.numpy as jnp
    import optax

    from mridc_tpu.models import build_model
    from mridc_tpu.train.losses import process_reconstruction_loss

    cfg = base_cfg()
    for k in (args.set or []):
        key, _, val = k.partition("=")
        try:
            val = json.loads(val)
        except Exception:
            pass
        cfg[key] = val
    model = build_model(cfg)
    y, sens, mask = (jnp.asarray(x) for x in bench._data(args.batch))
    rng = np.random.default_rng(1)
    target = jnp.asarray(bench._rv(
        (rng.standard_normal((args.batch, bench.H, bench.W))
         + 1j * rng.standard_normal((args.batch, bench.H, bench.W))).astype(np.complex64)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), y, sens, mask)
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def train_step(params, opt_state, y, sens, mask, target):
        def loss_fn(p):
            out = model.apply({"params": p}, y, sens, mask, train=True)
            return process_reconstruction_loss(out, target, "l1")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, params, opt_state, (y, sens, mask, target)


def run_train(args):
    train_step, params, opt_state, data = make_train_step(args)
    for _ in range(2):
        params, opt_state, loss = train_step(params, opt_state, *data)
        float(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, loss = train_step(params, opt_state, *data)
        float(loss)
    dt = time.perf_counter() - t0
    sps = args.iters * args.batch / dt
    print(json.dumps({"exp": "train", "batch": args.batch, "set": args.set,
                      "slices_per_s": round(sps, 2), "s_per_step": round(dt / args.iters, 3)}))


def run_trace_infer(args):
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model

    model = build_model(base_cfg())
    y, sens, mask = (jnp.asarray(x) for x in bench._data(args.batch))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), y, sens, mask)

    @jax.jit
    def forward(variables, y, sens, mask):
        pred = model.apply(variables, y, sens, mask).prediction
        return (pred**2).sum()

    for _ in range(2):
        float(forward(variables, y, sens, mask))
    jax.profiler.start_trace(args.out)
    for _ in range(2):
        float(forward(variables, y, sens, mask))
    jax.profiler.stop_trace()
    print(json.dumps({"exp": "trace-infer", "out": args.out}))


def run_trace_train(args):
    import jax

    train_step, params, opt_state, data = make_train_step(args)
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
    pi.add_argument("--dc-dtype", default=None)
    pq = sub.add_parser("quality")
    pq.add_argument("--dc-dtype", default=None)
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
    args = p.parse_args()
    {"infer": run_infer, "quality": run_quality, "train": run_train,
     "trace-train": run_trace_train, "trace-infer": run_trace_infer}[args.cmd](args)


if __name__ == "__main__":
    main()
