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
# batch 32: +7% over 16 on v5e (19.97 -> 21.09 slices/s); 64 adds <1.5% more
BATCH = int(os.environ.get("BENCH_BATCH", 32))
WARMUP = 2
ITERS = 7  # ITERS * BATCH = 112 slices
CASCADES, TIME_STEPS, FILTERS = 5, 8, 64


def _rv(x):
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


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
        # bf16 conv/RNN compute, f32 params & DC: verified SSIM 1.000000 vs the
        # f32 CPU reference path (max rel diff 4e-4)
        "compute_dtype": "bfloat16",
        # inference fast path: skip stacking cascades x T per-step predictions
        # (bit-identical final prediction; verified vs stacked path)
        "stack_intermediates": False,
    }
    model = build_model(cfg)
    y, sens, mask = (jnp.asarray(x) for x in _data(BATCH))
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

    for _ in range(WARMUP):
        float(forward(variables, y, sens, mask))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(forward(variables, y, sens, mask))
    dt = time.perf_counter() - t0
    return (ITERS * BATCH) / dt


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
    jax_sps = bench_jax()
    try:
        cpu_sps = bench_torch_cpu()
    except Exception:
        cpu_sps = None
    vs = (jax_sps / cpu_sps) if cpu_sps else None
    print(
        json.dumps(
            {
                "metric": "CIRIM fastMRI-knee-sized (15 coils, 320x320) inference throughput per chip",
                "value": round(jax_sps, 3),
                "unit": "slices/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
