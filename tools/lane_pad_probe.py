"""Exact channel-padding probe for the CIRIM head/tail convs (VERDICT r4 #3).

The flagship's two lane-starved kernels (docs/performance.md "Where the
remaining time goes") in the production FOLDED layout:

  head: 5x5 conv, folded kernel [5, sw, 8, 128]  — 8 input channels
  tail: 3x3 conv, folded kernel [3, sw, 256, 4]  — 4 output channels

Zero-padding the starved channel dim is mathematically exact (zero input
channels contribute 0; extra output channels are sliced off; gradients to/from
the padding are identically zero). Whether it is FASTER is a question about
XLA's conv lowering on v5e — this probe measures each variant in isolation at
the exact production shapes/dtypes (fwd and fwd+bwd, inside a scan like
tools/kernel_floor.py), so the decision lands in docs/performance.md as a
kernel-floor entry either way.

Run on the TPU:   python tools/lane_pad_probe.py
CPU smoke:        LP_SMOKE=1 python tools/lane_pad_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = bool(int(os.environ.get("LP_SMOKE", "0")))
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = int(os.environ.get("BENCH_TRAIN_BATCH", 24)) if not SMOKE else 2
H, W, F = (320, 320, 64) if not SMOKE else (32, 32, 8)
WF = W // 2  # folded
ITERS = int(os.environ.get("LP_ITERS", 8 if not SMOKE else 2))
SCAN = int(os.environ.get("LP_SCAN", 4 if not SMOKE else 2))
DT = jnp.bfloat16

OUT = "/tmp/r5_results.jsonl"


def emit(rec):
    rec["t"] = round(time.time(), 1)
    line = json.dumps(rec)
    with open(OUT, "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


def _timed(fn, *args):
    """Median per-call seconds with the call chained SCAN times in one jit.
    The accumulator feeds back into the inputs (x + acc * 1e-20) so XLA
    cannot hoist the loop-invariant computation out of the scan, and the
    result is read back with float() (axon's block_until_ready does not
    synchronize)."""

    @jax.jit
    def run(args):
        def body(acc, _):
            return fn(*args, acc), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=SCAN)
        return acc

    float(run(args))  # compile
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / SCAN)
    return float(np.median(ts))


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def fwd_scalar(x, k, acc):
    out = conv(x + acc.astype(x.dtype) * 1e-20, k)
    return acc + out.astype(jnp.float32).sum() * 1e-20


def fwdbwd_scalar(x, k, acc, slice_out=None):
    def loss(k_, x_):
        y = conv(x_, k_)
        if slice_out:
            y = y[..., :slice_out]
        return y.astype(jnp.float32).sum()

    l, (gk, gx) = jax.value_and_grad(loss, argnums=(0, 1))(k, x + acc.astype(x.dtype) * 1e-20)
    return acc + (l + gk.astype(jnp.float32).sum() + gx.astype(jnp.float32).sum()) * 1e-20


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(DT)

    results = {}

    # ---- head: 5-tap folded conv, [B, H, WF+halo, cin] -> [B, H, WF, 2F]
    sw = 4  # folded tap count for 5x1 (fold_kernel: (1 + 2 + 2)//2 + 1)
    x8 = mk((B, H, WF + 2, 8))
    for cin in (8, 16, 32):
        x = x8 if cin == 8 else jnp.pad(x8, ((0, 0), (0, 0), (0, 0), (0, cin - 8)))
        k = mk((5, sw, cin, 2 * F))
        results[f"head_cin{cin}_fwd_ms"] = _timed(fwd_scalar, x, k) * 1e3
        results[f"head_cin{cin}_fwdbwd_ms"] = _timed(fwdbwd_scalar, x, k) * 1e3
        emit({"set": "lane_pad", "tag": f"head cin={cin}",
              "fwd_ms": round(results[f"head_cin{cin}_fwd_ms"], 3),
              "fwdbwd_ms": round(results[f"head_cin{cin}_fwdbwd_ms"], 3)})

    # ---- tail: 3-tap folded conv, [B, H, WF+halo, 2F] -> [B, H, WF, cout]
    xt = mk((B, H, WF + 2, 2 * F))
    for cout in (4, 8, 32, 128):
        k = mk((3, 3, 2 * F, cout))
        sl = 4 if cout > 4 else None
        results[f"tail_cout{cout}_fwd_ms"] = _timed(fwd_scalar, xt, k) * 1e3
        results[f"tail_cout{cout}_fwdbwd_ms"] = _timed(
            functools.partial(fwdbwd_scalar, slice_out=sl), xt, k
        ) * 1e3
        emit({"set": "lane_pad", "tag": f"tail cout={cout}",
              "fwd_ms": round(results[f"tail_cout{cout}_fwd_ms"], 3),
              "fwdbwd_ms": round(results[f"tail_cout{cout}_fwdbwd_ms"], 3)})

    # reference point: the big mid conv (dilated 3x3, 2F->2F) for scale
    km = mk((3, 3, 2 * F, 2 * F))
    emit({"set": "lane_pad", "tag": "mid 3x3 2F->2F (scale ref)",
          "fwd_ms": round(_timed(fwd_scalar, xt, km) * 1e3, 3),
          "fwdbwd_ms": round(_timed(fwdbwd_scalar, xt, km) * 1e3, 3)})




def vn_fold():
    """Fold hypothesis for the VN NormUnet convs (18ch at 320^2): time the
    level-0/1 ConvBlock convs unfolded vs lane-folded at the E2EVN bench
    shapes (batch 96, bf16). Decides whether a folded NormUnet is worth
    building (VERDICT r4 #2 'lane-fold or channel-pad the 18-channel convs')."""
    from mridc_tpu.nn.fold import fold_kernel

    rng = np.random.default_rng(0)
    Bv = int(os.environ.get("BENCH_VN_BATCH", 96)) if not SMOKE else 2
    Hv, Wv, Cv = (320, 320, 18) if not SMOKE else (32, 32, 4)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(DT)

    def fold_x(x):
        b, h, w, c = x.shape
        return x.reshape(b, h, w // 2, 2 * c)

    cases = [
        ("lvl0 2->C", (Bv, Hv, Wv, 2), (3, 3, 2, Cv)),
        ("lvl0 C->C", (Bv, Hv, Wv, Cv), (3, 3, Cv, Cv)),
        ("lvl0 2C->C (up)", (Bv, Hv, Wv, 2 * Cv), (3, 3, 2 * Cv, Cv)),
        ("lvl1 2C->2C", (Bv, Hv // 2, Wv // 2, 2 * Cv), (3, 3, 2 * Cv, 2 * Cv)),
    ]
    for tag, xs, ks in cases:
        x = mk(xs)
        k = mk(ks)
        # unfolded: SAME padding via explicit zero pad + VALID (matches folded halo)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        base_f = _timed(fwd_scalar, xp, k) * 1e3
        base_fb = _timed(fwdbwd_scalar, xp, k) * 1e3
        kf = fold_kernel(k, 1)
        xf = fold_x(x)
        xf = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)))
        xf = jnp.pad(xf, ((0, 0), (0, 0), (1, 1), (0, 0)))  # halo slot
        fold_f = _timed(fwd_scalar, xf, kf) * 1e3
        fold_fb = _timed(fwdbwd_scalar, xf, kf) * 1e3
        emit({"set": "vn_fold", "tag": tag, "batch": Bv,
              "unfolded_fwd_ms": round(base_f, 3), "folded_fwd_ms": round(fold_f, 3),
              "unfolded_fwdbwd_ms": round(base_fb, 3), "folded_fwdbwd_ms": round(fold_fb, 3),
              "fwd_speedup": round(base_f / fold_f, 2)})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "pad"):
        main()
    if which in ("all", "vnfold"):
        vn_fold()
