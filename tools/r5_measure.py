"""Round-5 one-off TPU measurement driver: run named measurement sets and
append JSON lines to /tmp/r5_results.jsonl (resilient to session timeouts)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

OUT = "/tmp/r5_results.jsonl"


def emit(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def vn(tag, batch, ov, warm=2, iters=5):
    t0 = time.time()
    fwd, args = bench.make_e2evn_forward(batch, ov)
    dt = bench.time_scalar_fn(fwd, args, warm, iters)
    emit({"set": "vn", "tag": tag, "batch": batch, "ov": ov,
          "slices_per_s": round(iters * batch / dt, 2), "wall_s": round(time.time() - t0)})


def cirim_infer(tag, batch, ov, warm=2, iters=5):
    t0 = time.time()
    fwd, args = bench.make_flagship_forward(batch, ov)
    dt = bench.time_scalar_fn(fwd, args, warm, iters)
    emit({"set": "cirim", "tag": tag, "batch": batch, "ov": ov,
          "slices_per_s": round(iters * batch / dt, 2), "wall_s": round(time.time() - t0)})


def cirim_train(tag, batch, ov, iters=4):
    t0 = time.time()
    step, params, opt_state, data = bench.make_flagship_train_step(batch, ov)
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, *data)
        float(loss)
    t1 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, *data)
        float(loss)
    dt = time.time() - t1
    emit({"set": "cirim_train", "tag": tag, "batch": batch, "ov": ov,
          "slices_per_s": round(iters * batch / dt, 2), "wall_s": round(time.time() - t0)})


SETS = {}


def register(name):
    def deco(fn):
        SETS[name] = fn
        return fn
    return deco


@register("vn_psf1d_bf16")
def _vn_psf1d_bf16():
    vn("bf16 psf1d", 32, {"dc_mode": "psf1d"})
    vn("bf16 psf1d", 64, {"dc_mode": "psf1d"})
    vn("bf16+dc16 psf1d", 32, {"dc_mode": "psf1d", "dc_dtype": "bfloat16"})


@register("vn_psf1d_sweep2")
def _vn_psf1d_sweep2():
    vn("bf16+dc16 psf1d", 64, {"dc_mode": "psf1d", "dc_dtype": "bfloat16"})
    vn("bf16 psf1d", 96, {"dc_mode": "psf1d"})
    vn("f32 psf1d", 64, {"compute_dtype": None, "dc_mode": "psf1d"})


@register("vn_psf1d_sweep3")
def _vn_psf1d_sweep3():
    vn("bf16+dc16 psf1d", 96, {"dc_mode": "psf1d", "dc_dtype": "bfloat16"})
    vn("f32 psf1d", 96, {"compute_dtype": None, "dc_mode": "psf1d"})


@register("train_e2e")
def _train_e2e():
    """Device-only train step vs data-included e2e with the HBM dataset
    cache — the VERDICT r5 #1 gap (bar: train_e2e_vs_device >= 0.5)."""
    t0 = time.time()
    dev_sps, _ = bench.bench_jax_train()
    emit({"set": "train", "tag": "device-only b24", "slices_per_s": round(dev_sps, 2),
          "wall_s": round(time.time() - t0)})
    t0 = time.time()
    e2e_sps, n = bench.bench_train_e2e()
    emit({"set": "train", "tag": "e2e devcache b24", "slices_per_s": round(e2e_sps, 2),
          "n": n, "vs_device": round(e2e_sps / dev_sps, 3), "wall_s": round(time.time() - t0)})
    os.environ["BENCH_E2E_DEVICE_CACHE"] = "0"
    t0 = time.time()
    e2e0_sps, n = bench.bench_train_e2e()
    emit({"set": "train", "tag": "e2e nocache b24", "slices_per_s": round(e2e0_sps, 2),
          "n": n, "vs_device": round(e2e0_sps / dev_sps, 3), "wall_s": round(time.time() - t0)})
    os.environ.pop("BENCH_E2E_DEVICE_CACHE", None)


if __name__ == "__main__":
    for name in sys.argv[1:]:
        SETS[name]()
