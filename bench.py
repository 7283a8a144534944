"""Benchmark: CIRIM reconstruction throughput (slices/sec/chip).

Measures the flagship CIRIM forward (5 cascades x 8 time steps, 64 filters,
IndRNN — the reference default config,
reference: projects/reconstruction/model_zoo/conf/base_cirim_train.yaml) on
fastMRI-multicoil-knee-sized inputs (15 coils, 320x320), on the default JAX
platform (TPU under the driver).

Baseline: the same architecture's forward implemented with torch on CPU
(the reference framework is torch-CPU-runnable only in this environment;
its deps (pytorch-lightning/omegaconf) are absent, so the baseline re-states
the reference compute graph — conv stacks, FFT data consistency, IndRNN —
with torch ops at float32, reference: mridc/collections/reconstruction/nn/rim/).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

COILS, H, W = 15, 320, 320
# batch 96: +2% over 64 with psf1d + lane folding (62.5 vs 61.3 slices/s v5e)
BATCH = int(os.environ.get("BENCH_BATCH", 96))
LAST_E2E_PROFILE = None  # host-CPU profile of the last bench_train_e2e run
WARMUP = 2
ITERS = 7  # ITERS * BATCH = 112 slices
CASCADES, TIME_STEPS, FILTERS = 5, 8, 64


def _rv(x):
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def cirim_flops_per_slice(psf1d: bool = True) -> float:
    """Analytic model FLOPs for one slice of the flagship CIRIM forward
    (XLA cost_analysis does not unroll lax.scan on this backend, so it
    under-reports by the cascades x time-steps factor).

    Per RIM time step:
      - DC chain: with the PSF-1D path (dc_mode=psf1d, what the bench runs),
        one [W, W] complex matmul per coil as Gauss 3-mult real matmuls
        (6*H*W*W flops/coil); the full path would be a forward + inverse 2D
        DFT (6*H*W*(H+W) flops/coil/direction). MFU credits what executes.
      - conv stack: 5x5 (4->F), 1x1 ih (F->F) x2 IndRNN layers, 3x3 dilated
        (F->F), 3x3 final (F->2)
    """
    hw = H * W
    dft = COILS * 6 * hw * W if psf1d else 2 * COILS * 6 * hw * (H + W)
    conv = (
        2 * hw * 25 * 4 * FILTERS      # conv1 5x5, 4 -> F
        + 2 * hw * FILTERS * FILTERS   # IndRNN ih1 1x1
        + 2 * hw * 9 * FILTERS * FILTERS  # conv2 3x3 dilated
        + 2 * hw * FILTERS * FILTERS   # IndRNN ih2 1x1
        + 2 * hw * 9 * FILTERS * 2     # final 3x3, F -> 2
    )
    return float(CASCADES * TIME_STEPS * (dft + conv))


def flagship_cfg(**overrides):
    """The flagship CIRIM bench config (reference default arch, bf16 compute,
    psf1d DC — see the inline notes in bench_jax). Shared with tools/perf_lab.py
    so one-off measurements stay comparable with the driver bench."""
    cfg = {
        "model_name": "CIRIM",
        "num_cascades": CASCADES,
        "time_steps": TIME_STEPS,
        "recurrent_layer": "IndRNN",
        "conv_filters": [FILTERS, FILTERS, 2],
        "conv_kernels": [5, 3, 3],
        "conv_dilations": [1, 2, 1],
        "recurrent_filters": [FILTERS, FILTERS, 0],
        "recurrent_kernels": [1, 1, 0],
        "recurrent_dilations": [1, 1, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
        "compute_dtype": "bfloat16",
        "dc_mode": "psf1d",
    }
    cfg.update(overrides)
    return cfg


def time_scalar_fn(fn, args, warmup, iters):
    """Time a jitted fn that returns a scalar; reads the scalar back each call
    because axon's block_until_ready does not synchronize."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return time.perf_counter() - t0


def _data(batch, real_view=True):
    rng = np.random.default_rng(0)
    shape = (batch, COILS, H, W)
    y = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    sens = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    sens /= np.sqrt((np.abs(sens) ** 2).sum(1, keepdims=True))
    mask = np.zeros((batch, 1, H, W), np.float32)
    mask[..., ::4] = 1.0
    mask[..., W // 2 - 16 : W // 2 + 16] = 1.0
    if real_view:
        return _rv(y), _rv(sens), mask
    return y, sens, mask


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model

    # flagship_cfg notes: bf16 conv/RNN compute with f32 params verified SSIM
    # 1.000000 vs the f32 CPU reference path (max rel diff 4e-4); the bench
    # mask (like all fastMRI-style masks) is 1D along the phase-encode axis,
    # so dc_mode=psf1d is exact — A^H M A collapses to one [W, W] matmul per
    # step (nn/dc.py; verified vs the full fwd+inv FFT path, max rel err
    # 3.7e-4 through 40 unrolled steps; 25.4 -> 39.7 slices/s);
    # infer_dc_dtype defaults to compute_dtype (bf16 DC chain: 62.6 -> 81.0
    # slices/s, SSIM-vs-f32 cert unchanged — see bench_quality and
    # docs/performance.md). stack_intermediates=False skips stacking the
    # cascades x T per-step predictions (bit-identical final prediction).
    forward, fargs = make_flagship_forward(BATCH)
    dt = time_scalar_fn(forward, fargs, WARMUP, ITERS)

    sps = (ITERS * BATCH) / dt
    tflops = cirim_flops_per_slice() * sps / 1e12
    return sps, tflops


def make_flagship_forward(batch, overrides=None):
    """Build the jitted flagship inference forward (scalar readback form).
    Returns (forward, (variables, y, sens, mask)) — shared with
    tools/perf_lab.py so its numbers match the driver bench."""
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model

    model = build_model(flagship_cfg(stack_intermediates=False, **(overrides or {})))
    y, sens, mask = (jnp.asarray(x) for x in _data(batch))
    # jit the init: eager init costs ~70s of per-op compiles over the axon tunnel
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), y, sens, mask)

    # NOTE: params are passed explicitly — the axon TPU backend rejects jitted
    # computations that close over committed device arrays. And its
    # block_until_ready does NOT synchronize, so the jitted fn reduces to an
    # f32 scalar that is read back to the host each call for honest timing.
    @jax.jit
    def forward(variables, y, sens, mask):
        pred = model.apply(variables, y, sens, mask).prediction
        return (pred**2).sum()

    return forward, (variables, y, sens, mask)


def quality_vs_exact(fast_overrides=None) -> dict:
    """SSIM + rel-l2 of a fast-path build against the f32 full-DC unfolded
    path with the SAME weights, on a small batch — certifies speed is not
    bought with accuracy (quality budget: SSIM within 1e-3 of the exact
    path, BASELINE.md). By default the fast build is exactly what bench_jax
    runs (it inherits infer_dc_dtype=bfloat16 from compute_dtype,
    models/recon/cirim.py from_config default); fast_overrides lets
    tools/perf_lab.py certify variants."""
    import jax
    import jax.numpy as jnp

    from mridc_tpu.metrics.reconstruction import ssim
    from mridc_tpu.models import build_model

    fast_cfg = flagship_cfg(stack_intermediates=False, lane_fold="always")
    fast_cfg.update(fast_overrides or {})
    fast = build_model(fast_cfg)
    exact = build_model(
        flagship_cfg(
            stack_intermediates=False, compute_dtype=None, dc_mode="full", lane_fold="never"
        )
    )
    y, sens, mask = (jnp.asarray(x) for x in _data(2))
    variables = jax.jit(exact.init)(jax.random.PRNGKey(0), y, sens, mask)
    p_fast = np.asarray(jax.jit(lambda v, y, s, m: fast.apply(v, y, s, m).prediction)(variables, y, sens, mask))
    p_ref = np.asarray(jax.jit(lambda v, y, s, m: exact.apply(v, y, s, m).prediction)(variables, y, sens, mask))

    def mag(x):
        m = np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
        return m / (m.max() or 1.0)

    return {
        "ssim_vs_f32": float(ssim(mag(p_ref), mag(p_fast))),
        "rel_l2": float(np.linalg.norm(p_fast - p_ref) / np.linalg.norm(p_ref)),
    }


def bench_quality() -> float:
    return quality_vs_exact()["ssim_vs_f32"]


_TRAIN_STEP_CACHE: dict = {}


def _hashable(v):
    """Canonicalize an override value into something hashable: perf_lab
    json-parses --set values, so lists/dicts (e.g. conv_filters=[64,64,2])
    reach this cache and must not TypeError the key lookup."""
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    return v


def make_flagship_train_step(batch, overrides=None):
    """Build the jitted flagship training step (forward + backward + adam).
    Returns (train_step, params, opt_state, data) — shared with
    tools/perf_lab.py so its numbers match the driver bench. Cached per
    (batch, overrides): bench_train_e2e reuses bench_jax_train's compiled
    step instead of paying a second multi-minute axon compile."""
    key = (batch, tuple(sorted((k, _hashable(v)) for k, v in (overrides or {}).items())))
    if key in _TRAIN_STEP_CACHE:
        return _TRAIN_STEP_CACHE[key]
    import jax
    import jax.numpy as jnp
    import optax

    from mridc_tpu.models import build_model
    from mridc_tpu.train.losses import process_reconstruction_loss

    # flagship_cfg: dc_mode=psf1d is exact for the 1D bench mask (bench_jax);
    # train_dc_dtype defaults to compute_dtype (bf16 DC chain in training:
    # 6.2 -> 9.9 slices/s, grad cosine 0.9996 vs f32 — docs/performance.md)
    cfg = flagship_cfg(**(overrides or {}))
    model = build_model(cfg)
    y, sens, mask = (jnp.asarray(x) for x in _data(batch))
    rng = np.random.default_rng(1)
    target = jnp.asarray(
        _rv((rng.standard_normal((batch, H, W)) + 1j * rng.standard_normal((batch, H, W))).astype(np.complex64))
    )
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

    out = (train_step, params, opt_state, (y, sens, mask, target))
    _TRAIN_STEP_CACHE[key] = out
    return out


def bench_jax_train() -> tuple:
    """Jitted training-step (forward + backward + adam) throughput at the
    reference training batch size."""
    # batch sweep with bf16 DC (round 3): 8->10.6(step-only remat), 16->10.4,
    # 24->10.7 (best), 28->8.8, 32->10.1, 48 OOMs
    batch = int(os.environ.get("BENCH_TRAIN_BATCH", 24))
    train_step, params, opt_state, data = make_flagship_train_step(batch)

    def run_once():
        nonlocal params, opt_state
        params, opt_state, loss = train_step(params, opt_state, *data)
        float(loss)

    for _ in range(2):
        run_once()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = time.perf_counter() - t0

    sps = (iters * batch) / dt
    # standard MFU accounting: training = 3x forward model flops (fwd + bwd);
    # rematerialization recompute is intentionally NOT credited
    tflops = 3 * cirim_flops_per_slice() * sps / 1e12
    return sps, tflops


VN_CASCADES, VN_CHANS, VN_POOLS = 8, 18, 4  # reference base_vn_train.yaml:7-9


def e2evn_flops_per_slice(dc_mode: str = "psf1d") -> float:
    """Analytic FLOPs for one slice of the E2EVN/VarNet forward (8 cascades,
    NormUnet 18ch/4pools — reference defaults).

    ``dc_mode="psf1d"`` credits the DC as what actually EXECUTES on the bench
    path (nn/dc.py PSF-1D: 3 Gauss [W, W] matmuls on the coil tensor — same
    executed-flops convention as cirim_flops_per_slice). ``dc_mode="full"``
    credits the canonical algorithm's forward+inverse 2D DFT-matmul pair
    (what the reference model's math requires on this backend) — the
    model-flops number for the exact-speedup view."""
    hw = H * W

    def cb(hw_i, cin, cout):  # ConvBlock: 3x3 (cin->cout) + 3x3 (cout->cout)
        return 2 * hw_i * 9 * (cin * cout + cout * cout)

    def tcb(hw_out, cin, cout):  # 2x2-stride-2 transpose conv: 1 tap/output
        return 2 * hw_out * cin * cout

    c = VN_CHANS
    unet = cb(hw, 2, c) + cb(hw // 4, c, 2 * c) + cb(hw // 16, 2 * c, 4 * c) + cb(hw // 64, 4 * c, 8 * c)
    unet += cb(hw // 256, 8 * c, 16 * c)  # bottleneck
    unet += tcb(hw // 64, 16 * c, 8 * c) + cb(hw // 64, 16 * c, 8 * c)
    unet += tcb(hw // 16, 8 * c, 4 * c) + cb(hw // 16, 8 * c, 4 * c)
    unet += tcb(hw // 4, 4 * c, 2 * c) + cb(hw // 4, 4 * c, 2 * c)
    unet += tcb(hw, 2 * c, c) + cb(hw, 2 * c, c) + 2 * hw * c * 2  # + final 1x1
    if dc_mode == "psf1d":
        dc = COILS * 6 * hw * W  # 3 Gauss [W, W] real matmuls per coil
    else:
        dc = 2 * COILS * 6 * hw * (H + W)  # fft2 + ifft2 as DFT matmuls
    cmuls = (6 + 8) * COILS * hw  # sens_expand + sens_reduce complex muls
    return float(VN_CASCADES * (unet + dc + cmuls))


def e2evn_cfg(**overrides):
    """The E2EVN bench config: reference default arch + the CERTIFIED fast
    path (bf16 compute + psf1d DC + bf16 DC chain — trained-weight A/B at
    320x320/15 coils: SSIM vs f32 0.999949, tools/dtype_cert.py, r5)."""
    cfg = {
        "model_name": "VN",
        "num_cascades": VN_CASCADES,
        "channels": VN_CHANS,
        "pooling_layers": VN_POOLS,
        "fft_centered": True,
        "fft_normalization": "ortho",
        "compute_dtype": "bfloat16",
        "dc_mode": "psf1d",
        "dc_dtype": "bfloat16",
    }
    cfg.update(overrides)
    return cfg


def make_e2evn_forward(batch, overrides=None):
    """Jitted E2EVN/VarNet inference forward (scalar readback form)."""
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model

    model = build_model(e2evn_cfg(**(overrides or {})))
    y, sens, mask = (jnp.asarray(x) for x in _data(batch))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), y, sens, mask)

    @jax.jit
    def forward(variables, y, sens, mask):
        pred = model.apply(variables, y, sens, mask).prediction
        return (pred**2).sum()

    return forward, (variables, y, sens, mask)


def bench_e2evn() -> tuple:
    """E2EVN slices/s + (executed TFLOP/s, model TFLOP/s) — BASELINE driver
    metric names 'CIRIM/E2EVN'; this covers the second half. Executed flops
    credit the PSF-1D DC that actually runs (CIRIM convention); model flops
    credit the canonical full-DC algorithm the psf1d identity replaces."""
    # batch sweep 32/64/96/128/160 (tools/vn_batch_probe.py, v5e): 128 wins
    # (274 slices/s, exec-MFU 0.166; 96: 219/0.133, 160 regresses to 195)
    batch = int(os.environ.get("BENCH_VN_BATCH", 128))
    forward, fargs = make_e2evn_forward(batch)
    dt = time_scalar_fn(forward, fargs, WARMUP, ITERS)
    sps = (ITERS * batch) / dt
    return sps, e2evn_flops_per_slice("psf1d") * sps / 1e12, e2evn_flops_per_slice("full") * sps / 1e12


def e2evn_quality() -> float:
    """SSIM of the certified-fast E2EVN (bf16 + psf1d + bf16 DC) against the
    exact f32 full-DC build with the SAME weights at RANDOM init — the
    weight-independent lower bound. Through 8 unrolled non-contractive
    random cascades bf16 rounding compounds unrealistically, so this bound is
    pessimistic; the production claim is the TRAINED-weight certificate
    (bench emits it as e2evn_trained_cert_ssim; tools/dtype_cert.py vn)."""
    import jax
    import jax.numpy as jnp

    from mridc_tpu.metrics.reconstruction import ssim
    from mridc_tpu.models import build_model

    base = {
        "model_name": "VN", "num_cascades": VN_CASCADES, "channels": VN_CHANS,
        "pooling_layers": VN_POOLS, "fft_centered": True, "fft_normalization": "ortho",
    }
    fast_m = build_model(e2evn_cfg())
    exact_m = build_model(base)
    y, sens, mask = (jnp.asarray(x) for x in _data(2))
    variables = jax.jit(exact_m.init)(jax.random.PRNGKey(0), y, sens, mask)
    p_fast = np.asarray(jax.jit(lambda v, y, s, m: fast_m.apply(v, y, s, m).prediction)(variables, y, sens, mask))
    p_ref = np.asarray(jax.jit(lambda v, y, s, m: exact_m.apply(v, y, s, m).prediction)(variables, y, sens, mask))

    def mag(x):
        m = np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
        return m / (m.max() or 1.0)

    return float(ssim(mag(p_ref), mag(p_fast)))


def e2evn_trained_cert() -> float:
    """Trained-weight bf16+psf1d+dc16 certificate: train VN briefly on the
    synthetic recon task, A/B vs exact f32 at production size with the SAME
    trained weights, return SSIM (tools/dtype_cert.py cert_vn, r5 measured
    0.999949 at 300 steps)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "dtype_cert", pathlib.Path(__file__).parent / "tools" / "dtype_cert.py"
    )
    dc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dc)
    steps = int(os.environ.get("BENCH_VN_CERT_STEPS", 150))
    recs = dc.cert_vn(steps, eval_batch=2)
    for r in recs:
        if r.get("tag") == "bf16+dc16":
            return float(r["ssim_vs_f32"])
    return None


def bench_train_e2e() -> tuple:
    """Data-INCLUDED flagship training throughput: real h5 reads + the full
    numpy transform pipeline (num_workers threads + background prefetch)
    feeding the same jitted train step as bench_jax_train. Returns
    (slices/s, n_slices) — compare against the device-only number to see the
    input-pipeline overhead (VERDICT r3 #3)."""
    import tempfile
    from pathlib import Path

    import h5py
    import jax.numpy as jnp

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", 24))
    n_files, slices_per = 2, 2 * batch  # 2 epochs x 4 batches of real IO
    rng = np.random.default_rng(3)
    tmp = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    for n in range(n_files):
        with h5py.File(tmp / f"vol{n}.h5", "w") as f:
            ks = rng.standard_normal((slices_per, COILS, H, W)) + 1j * rng.standard_normal(
                (slices_per, COILS, H, W)
            )
            f["kspace"] = ks.astype(np.complex64)
            sens = rng.standard_normal((slices_per, COILS, H, W)) + 1j * rng.standard_normal(
                (slices_per, COILS, H, W)
            )
            sens /= np.sqrt((np.abs(sens) ** 2).sum(1, keepdims=True))
            f["sensitivity_map"] = sens.astype(np.complex64)

    from mridc_tpu.data.cache import to_device_f32
    from mridc_tpu.data.factory import build_dataloader

    # transfer_dtype=bfloat16 + device_prefetch: the heavy real-view leaves
    # cross the host->device link in bf16 (half the bytes; exact for the
    # bf16-compute flagship, which casts them to bf16 on device anyway) on a
    # background thread, overlapping the transfer with the train step. On
    # axon the link is a ~43 MB/s tunnel, so epoch-1 is transfer-bound; the
    # HBM-resident dataset cache (device_cache_dataset) then serves epoch 2+
    # by on-device gather — ~zero host work and wire bytes, which is the
    # steady state a real multi-epoch training run spends its life in
    # (data/cache.py; docs/performance.md).
    loader = build_dataloader(
        {
            "data_path": str(tmp),
            "batch_size": batch,
            "shuffle": True,
            "drop_last": True,
            "num_workers": int(os.environ.get("BENCH_E2E_WORKERS", 8)),
            "prefetch_batches": 2,
            "transfer_dtype": os.environ.get("BENCH_E2E_TRANSFER_DTYPE", "bfloat16"),
            "device_prefetch": True,
            "cache_dataset": "memory",
            "device_cache_dataset": os.environ.get("BENCH_E2E_DEVICE_CACHE", "1") != "0",
            "pad_shape": (COILS, H, W),
            "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
            "fft_centered": True,
            "fft_normalization": "ortho",
        }
    )
    train_step, params, opt_state, _ = make_flagship_train_step(batch)

    def feed(b):
        # to_device_f32: bf16 leaves cross the wire at half width and upcast
        # ON DEVICE, so the train step keeps the f32 avals it was compiled
        # with by bench_jax_train (no transfer_dtype-induced recompile);
        # device-cached epochs hand f32 device arrays straight through.
        y = to_device_f32(b["masked_kspace"])
        sens = to_device_f32(b["sensitivity_maps"])
        m = jnp.asarray(b["mask"])
        if m.shape[-1] == 1:
            m = m[..., 0]
        while m.ndim > 4:
            m = m[:, 0]
        if m.ndim == 3:
            m = m[:, None]
        m = jnp.broadcast_to(m.astype(jnp.float32), (m.shape[0], 1, H, W))
        return y, sens, m, to_device_f32(b["target"])

    # warm epoch: compiles nothing new (same f32 avals as bench_jax_train),
    # brings the page cache to steady state, and populates the dataset
    # caches — the measured epochs are realistic epoch-2+ throughput
    for b in loader:
        params, opt_state, loss = train_step(params, opt_state, *feed(b))
    float(loss)
    n = 0
    t0 = time.perf_counter()
    cpu0 = time.process_time()
    for _ in range(2):
        for b in loader:
            params, opt_state, loss = train_step(params, opt_state, *feed(b))
            n += batch
    float(loss)
    dt = time.perf_counter() - t0
    # epoch-2+ host-CPU profile (VERDICT r5 #1): process_time measures the
    # host CPU seconds this process spent across the measured epochs — with
    # the HBM dataset cache the steady state is an int32 index gather per
    # step, so host CPU should be a small fraction of wall
    global LAST_E2E_PROFILE
    LAST_E2E_PROFILE = {
        "wall_s": round(dt, 2),
        "host_cpu_s": round(time.process_time() - cpu0, 2),
        "steps": n // batch,
        "host_cpu_ms_per_step": round(1e3 * (time.process_time() - cpu0) / (n // batch), 1),
    }
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return n / dt, n


def bench_torch_cpu(max_seconds: float = 90.0) -> float:
    """Reference-equivalent CIRIM forward in torch (CPU, float32)."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)

    class Step(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(4, FILTERS, 5, padding=2)
            self.ih1 = torch.nn.Conv2d(FILTERS, FILTERS, 1)
            self.hh1 = torch.nn.Parameter(torch.randn(1, FILTERS, 1, 1) * 0.01)
            self.conv2 = torch.nn.Conv2d(FILTERS, FILTERS, 3, padding=2, dilation=2)
            self.ih2 = torch.nn.Conv2d(FILTERS, FILTERS, 1)
            self.hh2 = torch.nn.Parameter(torch.randn(1, FILTERS, 1, 1) * 0.01)
            self.final = torch.nn.Conv2d(FILTERS, 2, 3, padding=1, bias=False)

        def forward(self, eta, y, sens, mask, h1, h2):
            coil = eta.unsqueeze(1) * sens
            k = torch.fft.fft2(torch.fft.ifftshift(coil, dim=(-2, -1)), norm="ortho")
            k = torch.fft.fftshift(k, dim=(-2, -1))
            resid = torch.fft.ifftshift(mask * (k - y), dim=(-2, -1))
            img = torch.fft.fftshift(torch.fft.ifft2(resid, norm="ortho"), dim=(-2, -1))
            grad = (img * sens.conj()).sum(1)
            x = torch.stack([eta.real, eta.imag, grad.real, grad.imag], 1)
            x = torch.relu(self.conv1(x))
            h1 = torch.relu(self.ih1(x) + self.hh1 * h1)
            x = torch.relu(self.conv2(h1))
            h2 = torch.relu(self.ih2(x) + self.hh2 * h2)
            dx = self.final(h2)
            eta = eta + torch.complex(dx[:, 0], dx[:, 1])
            return eta, h1, h2

    step = Step().eval()
    y_np, sens_np, mask_np = _data(1, real_view=False)
    y = torch.from_numpy(y_np)
    sens = torch.from_numpy(sens_np)
    mask = torch.from_numpy(mask_np)

    def one_slice():
        with torch.no_grad():
            img = torch.fft.fftshift(
                torch.fft.ifft2(torch.fft.ifftshift(y, dim=(-2, -1)), norm="ortho"), dim=(-2, -1)
            )
            eta = (img * sens.conj()).sum(1)
            for _ in range(CASCADES):
                h1 = torch.zeros(1, FILTERS, H, W)
                h2 = torch.zeros(1, FILTERS, H, W)
                for _ in range(TIME_STEPS):
                    eta, h1, h2 = step(eta, y, sens, mask, h1, h2)
        return eta

    one_slice()  # warmup
    t0 = time.perf_counter()
    n = 0
    while True:
        one_slice()
        n += 1
        dt = time.perf_counter() - t0
        if n >= 3 or dt > max_seconds:
            break
    return n / dt


def main():
    # v5e bf16 peak: 197 TFLOP/s (override for other chips)
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))
    # Wall-clock budget: the core metrics (CIRIM infer + train + the torch
    # baseline) always run; the remaining sections are skipped (null) once the
    # budget is spent, so a slow/contended axon session still EMITS the JSON
    # line instead of being killed by the driver's timeout with no output.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1800.0))
    t_start = time.perf_counter()

    def have_time(need: float = 0.0):
        # cost-aware gate: start a section only if its rough uncontended cost
        # still fits the budget, so one slow section skips itself instead of
        # starving every cheaper section queued behind it
        return (time.perf_counter() - t_start) < budget_s - need

    jax_sps, infer_tflops = bench_jax()
    try:
        train_sps, train_tflops = bench_jax_train()
    except Exception:
        train_sps = train_tflops = None
    try:
        cpu_sps = bench_torch_cpu()
    except Exception:
        cpu_sps = None
    # optional sections, budget-gated in priority order; a failing section
    # reports itself on stderr (one line, diagnosable from the driver's tail)
    # instead of silently emitting null
    import sys

    def _section(name, need, fn):
        try:
            if have_time(need):
                return fn()
            print(f"bench: section {name} skipped (budget)", file=sys.stderr)
        except Exception as e:
            print(f"bench: section {name} failed: {e!r}", file=sys.stderr)
        return None

    quality_ssim = _section("quality", 120, bench_quality)
    vn = _section("e2evn", 180, bench_e2evn)
    vn_sps, vn_tflops, vn_model_tflops = vn if vn else (None, None, None)
    e2e = _section("train_e2e", 420, bench_train_e2e)
    e2e_sps = e2e[0] if e2e else None
    # cheap weight-independent bound before the cert
    vn_ssim = _section("e2evn_quality", 120, e2evn_quality)
    vn_cert = _section("e2evn_trained_cert", 300, e2evn_trained_cert)
    vs = (jax_sps / cpu_sps) if cpu_sps else None
    print(
        json.dumps(
            {
                "metric": "CIRIM fastMRI-knee-sized (15 coils, 320x320) inference throughput per chip",
                "value": round(jax_sps, 3),
                "unit": "slices/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "train_slices_per_s": round(train_sps, 3) if train_sps else None,
                "infer_tflops": round(infer_tflops, 1) if infer_tflops else None,
                "train_tflops": round(train_tflops, 1) if train_tflops else None,
                "infer_mfu": round(infer_tflops / peak_tflops, 3) if infer_tflops else None,
                "train_mfu": round(train_tflops / peak_tflops, 3) if train_tflops else None,
                # fast path (bf16 + psf1d + lane folding) vs f32 full-DC path,
                # same weights — certifies speed is not bought with accuracy
                "quality_ssim_vs_f32": round(quality_ssim, 6) if quality_ssim is not None else None,
                # E2EVN (second half of the BASELINE driver metric "CIRIM/E2EVN"):
                # certified fast path (bf16 + psf1d + bf16 DC chain).
                # e2evn_mfu credits executed flops (CIRIM convention);
                # e2evn_mfu_model credits the canonical full-DC algorithm the
                # exact psf1d identity replaces (model-flops view).
                "e2evn_slices_per_s": round(vn_sps, 3) if vn_sps else None,
                "e2evn_mfu": round(vn_tflops / peak_tflops, 3) if vn_tflops else None,
                "e2evn_mfu_model": round(vn_model_tflops / peak_tflops, 3) if vn_model_tflops else None,
                # TRAINED-weight bf16+dc16 vs f32 certificate at 320x320/15c
                # (tools/dtype_cert.py; 0.999949 at 300 steps, r5)
                "e2evn_trained_cert_ssim": round(vn_cert, 6) if vn_cert is not None else None,
                # weight-independent random-init lower bound (pessimistic)
                "e2evn_ssim_vs_f32": round(vn_ssim, 6) if vn_ssim is not None else None,
                # data-INCLUDED training throughput (h5 + transforms + prefetch)
                "train_e2e_slices_per_s": round(e2e_sps, 3) if e2e_sps else None,
                "train_e2e_vs_device": round(e2e_sps / train_sps, 3) if (e2e_sps and train_sps) else None,
            }
        )
    )


if __name__ == "__main__":
    main()
