"""Pallas fused LLG kernel: interpret-mode numerical parity with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def test_llg_fused_matches_xla(monkeypatch):
    # route pallas_call through the interpreter (CPU test environment)
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import importlib

    import mridc_tpu.ops.kernels.llg as L

    importlib.reload(L)
    from mridc_tpu.nn.dc import log_likelihood_gradient

    rng = np.random.default_rng(0)
    B, C, H, W = 1, 3, 32, 32
    eta = jnp.asarray(rng.standard_normal((B, H, W, 2)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, C, H, W, 2)).astype(np.float32))
    sens = jnp.asarray(rng.standard_normal((B, C, H, W, 2)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, 1, H, W)) < 0.5).astype(np.float32))

    got = np.asarray(L.llg_fused(eta, y, sens, mask, True, "ortho"))
    want = np.asarray(log_likelihood_gradient(eta, y, sens, mask, 1.0, True, "ortho"))[..., 2:4]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    importlib.reload(L)  # restore non-interpret module state
