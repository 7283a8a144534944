"""Trained-weight dtype certification for the bf16 fast paths (VERDICT r4 #2/#8).

The weight-independent random-init A/B in bench.py is a lower bound: through 8
unrolled DC cascades, random-init regularizer outputs are not contractive, so
bf16 rounding compounds unrealistically. A production quality claim needs the
A/B at a TRAINED operating point. This tool trains the model briefly on a
learnable synthetic task (small spatial size — conv weights are
resolution-independent), then runs the f32-vs-bf16 A/B with the SAME trained
weights at production size (VN: 320x320, 15 coils; qVN: the 150/150/600/150
gamma defaults the knob table flags).

Usage:  python tools/dtype_cert.py vn [--steps N] [--eval-batch B]
        python tools/dtype_cert.py qvn [--steps N]
Emits one JSON line per certification to stdout and /tmp/r5_results.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/r5_results.jsonl"


def emit(rec):
    rec["t"] = round(time.time(), 1)
    line = json.dumps(rec)
    with open(OUT, "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


def _rv(x):
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def _smooth_image(rng, b, h, w, keep=0.12):
    """Low-pass random complex images, unit max magnitude."""
    x = rng.standard_normal((b, h, w)) + 1j * rng.standard_normal((b, h, w))
    k = np.fft.fftshift(np.fft.fft2(x), axes=(-2, -1))
    lp = np.zeros((h, w))
    kh, kw = max(2, int(h * keep / 2)), max(2, int(w * keep / 2))
    lp[h // 2 - kh : h // 2 + kh, w // 2 - kw : w // 2 + kw] = 1.0
    x = np.fft.ifft2(np.fft.ifftshift(k * lp, axes=(-2, -1)))
    return (x / np.abs(x).max((-2, -1), keepdims=True)).astype(np.complex64)


def _sens_maps(rng, b, c, h, w):
    s = _smooth_image(rng, b * c, h, w, keep=0.2).reshape(b, c, h, w)
    s = s + 0.5  # avoid near-zero coils
    s /= np.sqrt((np.abs(s) ** 2).sum(1, keepdims=True))
    return s.astype(np.complex64)


def _mask1d(rng, h, w, acc=4, cf=0.08):
    m = np.zeros((1, 1, h, w), np.float32)
    ncf = int(round(w * cf))
    m[..., w // 2 - ncf // 2 : w // 2 + (ncf + 1) // 2] = 1.0
    rest = [i for i in range(w) if not m[0, 0, 0, i]]
    take = max(0, w // acc - ncf)
    m[..., rng.choice(rest, size=take, replace=False)] = 1.0
    return m


def _vn_batch(rng, b, c, h, w, mask):
    import jax.numpy as jnp

    from mridc_tpu.ops.fft import fft2_rv

    x = _smooth_image(rng, b, h, w)
    sens = _sens_maps(rng, b, c, h, w)
    coil = x[:, None] * sens
    kfull = np.asarray(fft2_rv(jnp.asarray(_rv(coil)), True, "ortho", (-2, -1)))
    y = kfull * mask[..., None]
    return jnp.asarray(y), jnp.asarray(_rv(sens)), jnp.asarray(np.broadcast_to(mask, (b, 1, h, w))), jnp.asarray(_rv(x))


def cert_vn(steps: int, eval_batch: int):
    """Returns the list of emitted records (bench.py consumes the
    bf16+dc16 ssim_vs_f32 as e2evn_trained_cert_ssim)."""
    records = []
    import jax
    import jax.numpy as jnp
    import optax

    from mridc_tpu.metrics.reconstruction import ssim
    from mridc_tpu.models import build_model

    t0 = time.time()
    base = {
        "model_name": "VN", "num_cascades": 8, "channels": 18, "pooling_layers": 4,
        "fft_centered": True, "fft_normalization": "ortho", "dc_mode": "psf1d",
    }
    b, c, h, w = 8, 4, 64, 64
    rng = np.random.default_rng(0)
    mask = _mask1d(rng, h, w)
    model = build_model(base)
    y, sens, m, target = _vn_batch(rng, b, c, h, w, mask)
    params = model.init(jax.random.PRNGKey(0), y, sens, m)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, y, sens, m, target):
        def loss_fn(p):
            pred = model.apply({"params": p}, y, sens, m, train=True).prediction
            return jnp.abs(pred - target).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        yb, sb, mb, tb = _vn_batch(np.random.default_rng(100 + i), b, c, h, w, mask)
        params, opt_state, loss = step(params, opt_state, yb, sb, mb, tb)
        losses.append(float(loss))
    emit({"set": "cert_vn", "tag": "train", "steps": steps,
          "loss0": round(losses[0], 5), "lossN": round(losses[-1], 5),
          "wall_s": round(time.time() - t0)})
    assert losses[-1] < 0.5 * losses[0], f"VN cert training did not converge: {losses[:3]}...{losses[-3:]}"

    # production-size A/B with the trained weights
    hp, wp, cp = 320, 320, 15
    rng_e = np.random.default_rng(999)
    mask_p = _mask1d(rng_e, hp, wp)
    ye, se, me, te = _vn_batch(rng_e, eval_batch, cp, hp, wp, mask_p)

    def fwd(cfg_extra):
        mdl = build_model({**base, **cfg_extra})
        out = jax.jit(lambda p, y, s, m: mdl.apply({"params": p}, y, s, m).prediction)(params, ye, se, me)
        return np.asarray(out)

    ref = fwd({})  # f32 psf1d

    def mag(x):
        v = np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
        return v / v.max()

    tgt_m = mag(np.asarray(te))
    s_ref = float(ssim(tgt_m, mag(ref)))
    for tag, extra in (
        ("bf16", {"compute_dtype": "bfloat16"}),
        ("bf16+dc16", {"compute_dtype": "bfloat16", "dc_dtype": "bfloat16"}),
        ("full-f32", {"dc_mode": "full"}),
    ):
        got = fwd(extra)
        rec = {
            "set": "cert_vn", "tag": tag,
            "ssim_vs_f32": round(float(ssim(mag(ref), mag(got))), 6),
            "ssim_vs_target": round(float(ssim(tgt_m, mag(got))), 6),
            "ssim_f32_vs_target": round(s_ref, 6),
            "nmse_vs_f32": round(float(((got - ref) ** 2).sum() / (ref**2).sum()), 8),
            "eval_hw": [hp, wp], "coils": cp, "wall_s": round(time.time() - t0),
        }
        records.append(rec)
        emit(rec)
    return records


def _qvn_batch(rng, b, e, c, h, w, tes, mask):
    import jax.numpy as jnp

    from mridc_tpu.models.quantitative.signal_model import fit_megre_maps, megre_signal
    from mridc_tpu.ops.cplx import cmul
    from mridc_tpu.ops.fft import fft2_rv, ifft2_rv

    def smooth_real(lo, hi, seed_off):
        v = np.abs(_smooth_image(np.random.default_rng(rng.integers(1 << 31) + seed_off), b, h, w))
        v = (v - v.min()) / (v.max() - v.min() + 1e-8)
        return (lo + (hi - lo) * v).astype(np.float32)

    r2s = smooth_real(5.0, 100.0, 1)
    s0 = smooth_real(0.2, 1.0, 2)
    b0 = smooth_real(-40.0, 40.0, 3)
    phi = smooth_real(-0.5, 0.5, 4)
    maps_t = np.stack([r2s, s0, b0, phi], axis=-1)
    echo = megre_signal(jnp.asarray(r2s), jnp.asarray(s0), jnp.asarray(b0), jnp.asarray(phi), tes)
    sens = jnp.asarray(_rv(_sens_maps(rng, b, c, h, w)))
    k = fft2_rv(cmul(echo[:, :, None], sens[:, None]), True, "ortho", (-2, -1))
    y = k * jnp.asarray(mask)[None, None, None, :, :, None]
    zf = ifft2_rv(y, True, "ortho", (-2, -1))
    from mridc_tpu.ops.cplx import cmul_conj

    zf_img = cmul_conj(zf, sens[:, None]).sum(axis=2)  # [B, E, H, W, 2]
    maps_init = fit_megre_maps(zf_img, tes)
    # clamp the noisy ZF fit to physical ranges (the AHEAD preprocessing keeps
    # map magnitudes bounded the same way) — unclamped outliers x gamma 600
    # blow through the MEGRE exponentials at random init
    lo = jnp.asarray([0.0, 0.0, -100.0, -np.pi], jnp.float32)
    hi = jnp.asarray([150.0, 2.0, 100.0, np.pi], jnp.float32)
    maps_init = jnp.clip(maps_init, lo[None, None, None], hi[None, None, None])
    mask4 = jnp.broadcast_to(jnp.asarray(mask), (b, 1, h, w))
    return y, sens, mask4, maps_init, jnp.asarray(maps_t)


def cert_qvn(steps: int):
    import jax
    import jax.numpy as jnp
    import optax

    from mridc_tpu.metrics.reconstruction import ssim
    from mridc_tpu.models import build_model

    t0 = time.time()
    base = {
        "model_name": "QVN",
        "quantitative_module_num_cascades": 4,
        "quantitative_module_channels": 18,
        "quantitative_module_pooling_layers": 2,
        "fft_centered": True, "fft_normalization": "ortho",
        # gamma stays at the 150/150/600/150 defaults under certification
    }
    b, e, c, h, w = 4, 4, 4, 32, 32
    tes = jnp.asarray([3.0, 11.5, 20.0, 28.5], jnp.float32)
    rng = np.random.default_rng(0)
    mask = _mask1d(rng, h, w, acc=2, cf=0.16)[0, 0]  # [H, W]
    gamma = np.asarray([150.0, 150.0, 600.0, 150.0], np.float32)

    model = build_model(base)
    y, sens, m, maps_init, maps_t = _qvn_batch(rng, b, e, c, h, w, tes, mask)
    params = model.init(jax.random.PRNGKey(0), y, sens, m, maps_init, tes)["params"]

    # damp the regularizers' final 1x1 convs at init: a random-init unet output
    # x gamma=600 feeds the complex-B0 cosh and overflows within 3 cascades
    # (the knob-table fragility); near-zero initial updates keep the unroll at
    # the stable fixed point so training can pull it toward the data
    def damp(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if len(keys) >= 3 and keys[-3] == "Unet_0" and keys[-2] == "Conv_0" and keys[-1] == "kernel":
            return leaf * 1e-2
        return leaf

    params = jax.tree_util.tree_map_with_path(damp, params)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, y, sens, m, maps_init, maps_t):
        def loss_fn(p):
            pred = model.apply({"params": p}, y, sens, m, maps_init, tes, train=True).prediction
            return (jnp.abs(pred - maps_t) / gamma[None, None, None, :]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        batch = _qvn_batch(np.random.default_rng(200 + i), b, e, c, h, w, tes, mask)
        params, opt_state, loss = step(params, opt_state, *batch)
        losses.append(float(loss))
    emit({"set": "cert_qvn", "tag": "train", "steps": steps,
          "loss0": round(losses[0], 5), "lossN": round(losses[-1], 5),
          "wall_s": round(time.time() - t0)})
    assert losses[-1] < 0.8 * losses[0], f"qVN cert training did not converge: {losses[:3]}...{losses[-3:]}"

    ye, se, me, mie, mte = _qvn_batch(np.random.default_rng(777), b, e, c, h, w, tes, mask)

    def fwd(cfg_extra):
        mdl = build_model({**base, **cfg_extra})
        out = jax.jit(lambda p: mdl.apply({"params": p}, ye, se, me, mie, tes).prediction)(params)
        return np.asarray(out)

    ref = fwd({})
    # the A/B is exactly the certification run the qVN bf16 guard points at,
    # so the explicit uncertified opt-out is required here
    got = fwd({"compute_dtype": "bfloat16", "quantitative_module_allow_bf16": True})
    rec = {"set": "cert_qvn", "tag": "bf16", "wall_s": round(time.time() - t0)}
    for i, name in enumerate(("R2star", "S0", "B0", "phi")):
        nm = float(((got[..., i] - ref[..., i]) ** 2).sum() / ((ref[..., i] ** 2).sum() + 1e-12))
        rec[f"nmse_{name}_vs_f32"] = round(nm, 8)
        r = ref[..., i]
        rng_i = float(r.max() - r.min() + 1e-12)
        rec[f"ssim_{name}_vs_f32"] = round(float(ssim((r - r.min()) / rng_i, (got[..., i] - r.min()) / rng_i)), 6)
        nt = float(((ref[..., i] - np.asarray(mte)[..., i]) ** 2).sum() / ((np.asarray(mte)[..., i] ** 2).sum() + 1e-12))
        rec[f"nmse_f32_vs_target_{name}"] = round(nt, 6)
    emit(rec)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["vn", "qvn"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--eval-batch", type=int, default=2)
    a = ap.parse_args()
    if a.which == "vn":
        cert_vn(a.steps or 300, a.eval_batch)
    else:
        cert_qvn(a.steps or 150)
