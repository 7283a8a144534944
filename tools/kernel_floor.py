"""Per-kernel floor microbenchmark for the flagship CIRIM training step.

VERDICT r4 #2: turn the prose roofline (docs/performance.md "Training-step
campaign") into a MEASURED upper bound — time each of the step's constituent
kernels in isolation at the exact production shapes/dtypes, multiply by the
remat-policy execution counts, and compare the sum to the measured full train
step. If the step is within ~10% of the floor, it is kernel-bound (the 9%
train MFU is the architecture's lane/bandwidth ceiling, not framework
overhead); a bigger gap names the overhead to chase.

Kernel inventory per (cascade, time-step) — flagship config (bf16 compute,
psf1d DC, lane folding, pointwise matmuls, remat_mode=step+cascade):
  - DC chain (coil-expand -> PSF-1D Gauss matmuls -> conj-reduce), bf16:
      fwd x2 (original + cascade-remat recompute; the step-level remat SAVES
      the named 'dc_grad' activation so it skips the third run), bwd x1
  - conv/RNN stack (5x5 conv -> IndRNN -> 3x3 dil conv -> IndRNN -> 3x3
    final), folded [B, H, W/2, 2C] layout, bf16:
      fwd x3 (original + cascade remat + step remat), bwd x1
Plus once per train step: the logspace-weighted stacked-eta l1 loss and the
adam update (timed, usually negligible).

Run on the TPU:   python tools/kernel_floor.py
CPU smoke:        KF_SMOKE=1 python tools/kernel_floor.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = bool(int(os.environ.get("KF_SMOKE", "0")))
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  (repo-root constants: COILS/H/W/FILTERS/...)

if SMOKE:
    bench.COILS, bench.H, bench.W = 3, 32, 32
    bench.CASCADES, bench.TIME_STEPS, bench.FILTERS = 2, 2, 8
    os.environ.setdefault("BENCH_TRAIN_BATCH", "2")

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", 24))
ITERS = int(os.environ.get("KF_ITERS", 8 if not SMOKE else 3))
SCAN = int(os.environ.get("KF_SCAN", 4 if not SMOKE else 2))


def _timed(fn, *args, iters=None, scan=None):
    """Median per-call seconds of ``fn(*args) -> scalar`` with the call chained
    ``scan`` times inside ONE jit (axon dispatch is ~35 ms — per-op timing
    outside a scan measures the tunnel, not the kernel)."""
    iters = iters or ITERS
    scan = scan or SCAN

    @jax.jit
    def run(args):
        def body(acc, _):
            out = fn(*jax.tree_util.tree_map(lambda a: a, args), acc)
            return out, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=scan)
        return acc

    float(run(args))  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(args))
        times.append((time.perf_counter() - t0) / scan)
    return float(np.median(times))


def _scalar_baseline():
    return _timed(lambda acc: acc + 1.0)


def _rv(rng, shape):
    return rng.standard_normal(shape + (2,)).astype(np.float32)


def build_pieces():
    """(stack_module, stack_vars, x_stack, dc_args) at production shapes."""
    import flax.linen as nn

    from mridc_tpu.nn.dc import log_likelihood_gradient_psf1d, psf1d_gauss_mats, sens_reduce
    from mridc_tpu.nn.fold import fold_w, unfold_w
    from mridc_tpu.nn.layers import ConvNonlinear
    from mridc_tpu.nn.rnn_cells import make_cell

    B, C, H, W, F = BATCH, bench.COILS, bench.H, bench.W, bench.FILTERS
    rng = np.random.default_rng(0)
    dt = "bfloat16"

    class Stack(nn.Module):
        """The _RIMStep conv/RNN stack exactly (folded layout, bf16,
        pointwise matmuls), minus the DC chain."""

        @nn.compact
        def __call__(self, x, h1, h2):
            x = fold_w(x.astype(dt))
            x = ConvNonlinear(F, 5, 1, True, "relu", dtype=dt, lane_fold=True)(x)
            cell1 = make_cell("IndRNN", F, 1, 1, True, dtype=dt, pointwise_matmul=True, lane_fold=True)
            x = cell1(x, h1)
            x = ConvNonlinear(F, 3, 2, True, "relu", dtype=dt, lane_fold=True)(x)
            cell2 = make_cell("IndRNN", F, 1, 1, True, dtype=dt, pointwise_matmul=True, lane_fold=True)
            x = cell2(x, h2)
            dx = ConvNonlinear(2, 3, 1, False, None, dtype=dt, lane_fold=True)(x)
            return unfold_w(dx)

    x_in = jnp.asarray(_rv(rng, (B, H, W)).reshape(B, H, W, 2))
    x4 = jnp.concatenate([x_in, x_in], axis=-1)  # [B, H, W, 4] dc-grad-like
    h_shape = (B, H, W // 2, 2 * F)
    h1 = jnp.asarray(rng.standard_normal(h_shape).astype(np.float32)).astype(dt)
    h2 = jnp.asarray(rng.standard_normal(h_shape).astype(np.float32)).astype(dt)
    stack = Stack()
    stack_vars = jax.jit(stack.init)(jax.random.PRNGKey(0), x4, h1, h2)

    # DC chain inputs (bf16 like train_dc_dtype)
    eta = x_in
    sens = jnp.asarray(_rv(rng, (B, C, H, W)) / np.sqrt(C))
    mask_row = np.zeros((B, W), np.float32)
    mask_row[:, ::4] = 1.0
    mask_row[:, W // 2 - max(W // 20, 1) : W // 2 + max(W // 20, 1)] = 1.0
    mats = psf1d_gauss_mats(jnp.asarray(mask_row), True, "ortho")
    y = jnp.asarray(_rv(rng, (B, C, H, W)))
    z0 = sens_reduce(y, sens, True, "ortho", (-2, -1), 1)
    dc_args = tuple(a.astype(jnp.bfloat16) for a in (eta, sens, mats, z0))

    def dc_fn(eta, sens, mats, z0):
        return log_likelihood_gradient_psf1d(eta, sens, mats, z0, sigma=1.0, coil_dim=1)

    return stack, stack_vars, (x4, h1, h2), dc_fn, dc_args


def main():
    base = _scalar_baseline()
    stack, stack_vars, (x4, h1, h2), dc_fn, dc_args = build_pieces()
    B = BATCH
    C, T = bench.CASCADES, bench.TIME_STEPS

    # ---- conv/RNN stack: fwd, then fwd+bwd (grads wrt params AND inputs,
    # matching the real step where x/h flow through the scan carry)
    def stack_fwd(params, x, h1, h2, acc):
        out = stack.apply(params, x + acc * 1e-20, h1, h2)
        return acc + (out.astype(jnp.float32) ** 2).sum() * 1e-20

    def stack_fwdbwd(params, x, h1, h2, acc):
        def loss(p, xx, hh1, hh2):
            return (stack.apply(p, xx, hh1, hh2).astype(jnp.float32) ** 2).sum()

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(params, x + acc * 1e-20, h1, h2)
        leaves = jax.tree_util.tree_leaves(g)
        return acc + sum((l.astype(jnp.float32) ** 2).sum() for l in leaves) * 1e-20

    t_stack_f = _timed(functools.partial(stack_fwd, stack_vars), x4, h1, h2) - base
    t_stack_fb = _timed(functools.partial(stack_fwdbwd, stack_vars), x4, h1, h2) - base
    t_stack_b = max(t_stack_fb - t_stack_f, 0.0)

    # ---- DC chain
    def dc_fwd(eta, sens, mats, z0, acc):
        out = dc_fn(eta + acc.astype(eta.dtype) * 1e-20, sens, mats, z0)
        return acc + (out.astype(jnp.float32) ** 2).sum() * 1e-20

    def dc_fwdbwd(eta, sens, mats, z0, acc):
        def loss(e):
            return (dc_fn(e, sens, mats, z0).astype(jnp.float32) ** 2).sum()

        g = jax.grad(loss)(eta + acc.astype(eta.dtype) * 1e-20)
        return acc + (g.astype(jnp.float32) ** 2).sum() * 1e-20

    t_dc_f = _timed(dc_fwd, *dc_args) - base
    t_dc_fb = _timed(dc_fwdbwd, *dc_args) - base
    t_dc_b = max(t_dc_fb - t_dc_f, 0.0)

    # ---- once-per-step pieces: loss + adam on flagship-sized trees
    import optax

    from mridc_tpu.train.losses import process_reconstruction_loss
    from mridc_tpu.models.base import ModelOutput

    rng = np.random.default_rng(1)
    etas = jnp.asarray(rng.standard_normal((C, T, B, bench.H, bench.W, 2)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((B, bench.H, bench.W, 2)).astype(np.float32))

    def loss_fn(etas, target, acc):
        out = ModelOutput(prediction=etas[-1, -1], intermediates=etas + acc * 1e-20)
        return acc + process_reconstruction_loss(out, target, "l1") * 1e-20

    t_loss = _timed(loss_fn, etas, target) - base

    _, params, opt_state, _ = bench.make_flagship_train_step(2)  # params only
    tx = optax.adam(1e-3)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def adam_fn(params, opt_state, grads, acc):
        scaled = jax.tree_util.tree_map(lambda g: g * (1.0 + acc * 1e-20), grads)
        updates, _ = tx.update(scaled, opt_state, params)
        new = optax.apply_updates(params, updates)
        return acc + sum((l.astype(jnp.float32) ** 2).sum() for l in jax.tree_util.tree_leaves(new)) * 1e-20

    t_adam = _timed(adam_fn, params, opt_state, grads) - base

    # ---- remat-policy execution counts (docstring inventory)
    per_step = 3 * t_stack_f + t_stack_b + 2 * t_dc_f + t_dc_b
    floor = C * T * per_step + t_loss + t_adam

    # ---- the measured full train step
    train_sps, _ = bench.bench_jax_train()
    step_t = B / train_sps

    rows = {
        "stack_fwd": t_stack_f, "stack_bwd": t_stack_b,
        "dc_fwd": t_dc_f, "dc_bwd": t_dc_b,
        "loss": t_loss, "adam": t_adam,
    }
    contrib = {
        "stack_fwd x3CT": 3 * C * T * t_stack_f,
        "stack_bwd x1CT": C * T * t_stack_b,
        "dc_fwd x2CT": 2 * C * T * t_dc_f,
        "dc_bwd x1CT": C * T * t_dc_b,
        "loss": t_loss,
        "adam": t_adam,
    }
    print(json.dumps({"isolated_s": {k: round(v, 6) for k, v in rows.items()}}))
    print(json.dumps({"floor_contributions_s": {k: round(v, 5) for k, v in contrib.items()}}))
    print(
        json.dumps(
            {
                "metric": "flagship train step vs per-kernel floor",
                "step_s": round(step_t, 5),
                "floor_s": round(floor, 5),
                "step_over_floor": round(step_t / floor, 4) if floor > 0 else None,
                "train_slices_per_s": round(train_sps, 3),
                "kernel_bound": bool(step_t <= 1.10 * floor),
            }
        )
    )


if __name__ == "__main__":
    main()
