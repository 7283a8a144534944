"""Metric/loss parity tests.

The SSIM loss oracle is the reference fastMRI formula re-stated with torch
(reference: mridc/collections/common/losses/ssim.py:11-61); the numpy SSIM is
checked for consistency with the jnp loss and for known analytic cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mridc_tpu.losses.ssim import SSIMLoss, ssim_loss
from mridc_tpu.metrics.reconstruction import ReconstructionMetrics, mse, nmse, psnr, ssim


def _torch_ssim_loss(X, Y, data_range, win_size=7, k1=0.01, k2=0.03):
    X, Y = torch.from_numpy(X), torch.from_numpy(Y)
    data_range = torch.from_numpy(np.asarray(data_range, np.float32))[:, None, None, None]
    w = torch.ones(1, 1, win_size, win_size) / win_size**2
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    C1 = (k1 * data_range) ** 2
    C2 = (k2 * data_range) ** 2
    ux, uy = F.conv2d(X, w), F.conv2d(Y, w)
    uxx, uyy, uxy = F.conv2d(X * X, w), F.conv2d(Y * Y, w), F.conv2d(X * Y, w)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1, A2, B1, B2 = (2 * ux * uy + C1, 2 * vxy + C2, ux**2 + uy**2 + C1, vx + vy + C2)
    S = (A1 * A2) / (B1 * B2)
    return float(1 - S.mean())


def test_ssim_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.random((2, 1, 32, 32)).astype(np.float32)
    y = (x + 0.1 * rng.random((2, 1, 32, 32))).astype(np.float32)
    dr = np.array([1.0, 1.0], np.float32)
    got = float(ssim_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(dr)))
    want = _torch_ssim_loss(x, y, dr)
    assert got == pytest.approx(want, abs=2e-5)


def test_ssim_loss_zero_for_identical():
    rng = np.random.default_rng(1)
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    loss = float(SSIMLoss()(jnp.asarray(x), jnp.asarray(x), jnp.ones(1)))
    assert loss == pytest.approx(0.0, abs=1e-6)


def test_basic_metrics():
    rng = np.random.default_rng(2)
    x = rng.random((3, 32, 32))
    y = x.copy()
    assert mse(x, y) == 0.0
    assert nmse(x, x + 0.0) == 0.0
    assert psnr(x, y) == float("inf")
    assert ssim(x, y) == pytest.approx(1.0, abs=1e-9)


def test_psnr_known_value():
    x = np.ones((1, 8, 8))
    y = np.zeros((1, 8, 8))
    # mse=1, range=1 -> psnr=0
    assert psnr(x, y, maxval=1.0) == pytest.approx(0.0)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(3)
    x = rng.random((2, 48, 48))
    y1 = x + 0.01 * rng.standard_normal(x.shape)
    y2 = x + 0.2 * rng.standard_normal(x.shape)
    assert ssim(x, y1) > ssim(x, y2)


def test_running_metrics():
    rng = np.random.default_rng(4)
    m = ReconstructionMetrics()
    for _ in range(3):
        x = rng.random((1, 32, 32))
        m.push(x, x + 0.05 * rng.standard_normal(x.shape))
    means = m.means()
    assert 0 < means["SSIM"] < 1
    assert means["MSE"] > 0
    assert "SSIM" in repr(m)


def test_aggregator_loss():
    """Reference common/losses/aggregator.py:19 — weighted sum of N losses."""
    from mridc_tpu.losses import AggregatorLoss

    agg = AggregatorLoss(num_inputs=2, weights=[0.5, 2.0])
    total = agg(jnp.asarray(1.0), jnp.asarray(3.0))
    assert float(total) == pytest.approx(0.5 * 1.0 + 2.0 * 3.0)
    unweighted = AggregatorLoss(num_inputs=3)
    assert float(unweighted(jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(3.0))) == pytest.approx(6.0)
    with pytest.raises(ValueError):
        AggregatorLoss(num_inputs=2, weights=[1.0])


def test_config_version_migration():
    """Reference utils/model_utils.py:437 — cls->_target_, params hoisted."""
    from mridc_tpu.train.config import maybe_update_config_version

    legacy = {"model": {"cls": "some.path.Model", "params": {"lr": 1e-3, "depth": 4}},
              "sched": {"params": {"warmup": 10}, "name": "cosine"}}
    new = maybe_update_config_version(legacy)
    assert new["model"]["_target_"] == "some.path.Model"
    assert new["model"]["lr"] == 1e-3 and new["model"]["depth"] == 4
    assert "params" not in new["model"] and "cls" not in new["model"]
    assert new["sched"] == {"warmup": 10, "name": "cosine"}
