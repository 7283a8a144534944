"""VarNet dc_mode=psf1d: the reduced-state restructuring must be exact
(fp reassociation only) against the full FFT path for 1D column masks.

Reference graph being preserved:
mridc/collections/reconstruction/nn/varnet/vn_block.py:125-135 (soft DC) —
see models/recon/vn.py module docstring for the derivation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mridc_tpu.models import build_model


def _data(B=2, C=4, H=64, W=64, seed=0):
    rng = np.random.default_rng(seed)

    def rv(x):
        return np.stack([x.real, x.imag], -1).astype(np.float32)

    sens = (rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(
        np.complex64
    )
    sens /= np.sqrt((np.abs(sens) ** 2).sum(1, keepdims=True))
    mask = np.zeros((B, 1, H, W), np.float32)
    mask[..., ::4] = 1
    mask[..., W // 2 - 8 : W // 2 + 8] = 1
    y = (rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(
        np.complex64
    ) * mask
    return jnp.asarray(rv(y)), jnp.asarray(rv(sens)), jnp.asarray(mask)


BASE = {
    "model_name": "VN",
    "num_cascades": 2,
    "channels": 8,
    "pooling_layers": 2,
    "fft_centered": True,
    "fft_normalization": "ortho",
}


def test_psf1d_same_param_tree_and_close():
    """Shared checkpoint tree; outputs agree to fp-noise levels. Untrained
    NormUnets amplify reassociation noise ~7x per cascade (measured), so the
    model-level tolerance is loose; exactness of the restructuring itself is
    pinned by test_psf1d_formula_exact_same_u below."""
    full = build_model(BASE)
    fast = build_model({**BASE, "dc_mode": "psf1d"})
    args = _data()
    v = jax.jit(full.init)(jax.random.PRNGKey(0), *args)
    vf = jax.jit(fast.init)(jax.random.PRNGKey(0), *args)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)
    p_full = np.asarray(jax.jit(lambda v, *a: full.apply(v, *a).prediction)(v, *args))
    p_fast = np.asarray(jax.jit(lambda v, *a: fast.apply(v, *a).prediction)(v, *args))
    rel = np.linalg.norm(p_fast - p_full) / np.linalg.norm(p_full)
    assert rel < 2e-2, rel


def test_psf1d_formula_exact_same_u():
    """With IDENTICAL per-cascade network outputs u_j, the reduced-state
    recursion reproduces the full path's sens-reduced image to fp noise —
    this is the exactness claim, independent of network noise amplification."""
    from mridc_tpu.nn.dc import (
        apply_psf1d,
        psf1d_gauss_mats,
        sens_expand,
        sens_reduce,
        soft_dc,
    )
    from mridc_tpu.ops.cplx import cmul, cmul_conj

    y, sens, mask = _data(B=1, C=3, H=48, W=48, seed=3)
    fc, fn, sd = True, "ortho", (-2, -1)
    rng = np.random.default_rng(7)
    us = [
        jnp.asarray(rng.standard_normal((1, 48, 48, 2)).astype(np.float32) * 0.1)
        for _ in range(3)
    ]
    ws = [0.7, 1.3, 0.9]

    @jax.jit
    def run(y, sens, mask, *us):
        m4 = mask[..., None]
        pred = y
        for u, w in zip(us, ws):
            pred = pred - soft_dc(pred, y, m4, w) - sens_expand(u, sens, fc, fn, sd)
        import mridc_tpu.ops.fft as F

        x_full = cmul_conj(F.ifft2_rv(pred, fc, fn, sd), sens).sum(1)

        mats = psf1d_gauss_mats(mask[:, 0, 0, :], fc, fn)
        x_y = sens_reduce(y, sens, fc, fn, sd, 1)
        rho = (sens[..., 0] ** 2 + sens[..., 1] ** 2).sum(1)[..., None]
        run_r = run_a = run_b = jnp.zeros_like(x_y)
        x = x_y
        for u, w in zip(us, ws):
            q = cmul_conj(apply_psf1d(cmul(u[:, None], sens), mats), sens).sum(1)
            run_b = run_b - w * (run_a + run_b)
            run_a = run_a - q
            run_r = run_r - rho * u
            x = x_y + run_r + run_b
        return jnp.linalg.norm(x - x_full) / jnp.linalg.norm(x_full)

    rel = float(run(y, sens, mask, *us))
    assert rel < 5e-4, rel


def test_psf1d_guards():
    with pytest.raises(ValueError, match="psf1d"):
        build_model({**BASE, "dc_mode": "psf1d", "no_dc": True})
    with pytest.raises(ValueError, match="psf1d"):
        build_model({**BASE, "dc_mode": "psf1d", "coil_combination_method": "RSS"})


def test_psf1d_trains():
    """Gradients flow through the reduced-state path (value_and_grad works
    and is finite)."""
    fast = build_model({**BASE, "dc_mode": "psf1d"})
    args = _data(B=1, C=2, H=32, W=32)
    v = jax.jit(fast.init)(jax.random.PRNGKey(0), *args)
    target = jnp.ones((1, 32, 32, 2), jnp.float32)

    @jax.jit
    def loss_fn(params):
        out = fast.apply({"params": params}, *args, train=True)
        return jnp.abs(out.prediction - target).mean()

    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
