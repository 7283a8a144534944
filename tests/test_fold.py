"""Lane folding (nn/fold.py): exactness of the folded-conv rewrite and of the
folded CIRIM path. The fold is a layout change only — parameters stay in the
standard [kh, kw, cin, cout] form, so the two paths share checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mridc_tpu.nn.fold import fold_kernel, fold_pad_amount, fold_w, halo_pad_folded, unfold_w


def _conv_ref(x, k, dw, dh, pad_mode):
    kh, kw = k.shape[:2]
    rh, rw = (kh - 1) // 2, (kw - 1) // 2
    x = jnp.pad(x, ((0, 0), (rh * dh, rh * dh), (rw * dw, rw * dw), (0, 0)), mode=pad_mode)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", rhs_dilation=(dh, dw), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("pad_mode", ["edge", "constant"])
@pytest.mark.parametrize("kh,kw,dw", [(3, 3, 1), (3, 3, 2), (5, 5, 1), (1, 1, 1)])
def test_folded_conv_exact(kh, kw, dw, pad_mode):
    rng = np.random.default_rng(0)
    cin, cout = 4, 6
    x = jnp.asarray(rng.standard_normal((2, 12, 16, cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)).astype(np.float32))
    want = _conv_ref(x, k, dw, dw, pad_mode)

    xf = fold_w(x)
    kf = fold_kernel(k, dw)
    rh = (kh - 1) // 2
    if rh:
        xf = jnp.pad(xf, ((0, 0), (rh * dw, rh * dw), (0, 0), (0, 0)), mode=pad_mode)
    if fold_pad_amount(kw, dw):
        xf = halo_pad_folded(xf, cin, "edge" if pad_mode == "edge" else "zero")
    got = unfold_w(
        jax.lax.conv_general_dilated(
            xf, kf, (1, 1), "VALID", rhs_dilation=(dw, 1), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fold_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 10, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unfold_w(fold_w(x))), np.asarray(x))


@pytest.mark.slow
def test_cirim_lane_fold_exact_and_checkpoint_compatible():
    from mridc_tpu.models import build_model

    rng = np.random.default_rng(2)

    def rv(z):
        return np.stack([z.real, z.imag], -1).astype(np.float32)

    B, C, H, W = 2, 3, 16, 20
    y = rv((rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64))
    s = rv((rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64))
    mask = np.zeros((B, 1, H, W), np.float32)
    mask[..., ::2] = 1
    cfg = {
        "model_name": "CIRIM",
        "num_cascades": 2,
        "time_steps": 3,
        "recurrent_layer": "IndRNN",
        "conv_filters": [8, 8, 2],
        "conv_kernels": [5, 3, 3],
        "conv_dilations": [1, 2, 1],
        "recurrent_filters": [8, 8, 0],
        "recurrent_kernels": [1, 1, 0],
        "recurrent_dilations": [1, 1, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    m0 = build_model({**cfg, "lane_fold": "never"})
    m1 = build_model({**cfg, "lane_fold": "always"})
    v = m0.init(jax.random.PRNGKey(0), y, s, mask)
    # identical parameter trees: folded is purely an execution-layout change
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), y, s, mask)
    )
    p0 = np.asarray(m0.apply(v, y, s, mask).prediction)
    p1 = np.asarray(m1.apply(v, y, s, mask).prediction)
    np.testing.assert_allclose(p1, p0, rtol=0, atol=1e-5 * np.abs(p0).max())
    # gradient flows through the folded path
    g = jax.grad(lambda p: float(0) + (m1.apply({"params": p}, y, s, mask, train=True).prediction ** 2).mean())(
        v["params"]
    )
    total = float(sum(jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(total) and total > 0


def test_lane_fold_auto_resolution():
    """auto folds only for IndRNN with even W on non-CPU backends (tests run
    on CPU, so auto must resolve to the unfolded path here)."""
    from mridc_tpu.nn.rim import RIMBlock

    rng = np.random.default_rng(3)

    def rv(z):
        return np.stack([z.real, z.imag], -1).astype(np.float32)

    B, C, H, W = 1, 2, 8, 10
    y = rv((rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64))
    s = rv((rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64))
    mask = np.ones((B, 1, H, W), np.float32)
    block = RIMBlock(
        conv_filters=(4, 4, 2), recurrent_filters=(4, 4, 0), time_steps=2, lane_fold="auto"
    )
    variables = block.init(jax.random.PRNGKey(0), y, s, mask)
    _, eta = block.apply(variables, y, s, mask)
    assert eta.shape == (B, H, W, 2)


def test_conv2d_cascade_lane_fold_exact():
    """CCNN/CRNN-style Conv2dCascade: folded path equals the standard path
    with shared params (zero-pad SAME semantics)."""
    from mridc_tpu.nn.conv2d import Conv2dCascade

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 2)).astype(np.float32))
    m0 = Conv2dCascade(out_channels=2, hidden_channels=8, n_convs=3, lane_fold="never")
    m1 = Conv2dCascade(out_channels=2, hidden_channels=8, n_convs=3, lane_fold="always")
    v = m0.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(0), x))
    a = np.asarray(m0.apply(v, x))
    b = np.asarray(m1.apply(v, x))
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-5 * np.abs(a).max())


def test_qrim_lane_fold_exact():
    """qRIMBlock folded conv stack equals the standard path with shared params."""
    from mridc_tpu.models.quantitative.qcirim import qRIMBlock

    rng = np.random.default_rng(9)
    B, E, C, H, W = 1, 2, 2, 12, 16
    y = jnp.asarray(rng.standard_normal((B, E, C, H, W, 2)).astype(np.float32))
    sens = jnp.asarray(rng.standard_normal((B, C, H, W, 2)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, 1, 1, H, W, 1)) > 0.4).astype(np.float32))
    maps = jnp.asarray(rng.random((B, H, W, 4)).astype(np.float32))
    gamma = jnp.asarray([150.0, 150.0, 600.0, 150.0])
    tes = jnp.asarray([3.0, 11.5])
    kw = dict(
        conv_filters=(8, 8, 4), recurrent_filters=(8, 8, 0), time_steps=2,
        fft_centered=False, fft_normalization="backward",
    )
    b0 = qRIMBlock(lane_fold="never", **kw)
    b1 = qRIMBlock(lane_fold="always", **kw)
    v = b0.init(jax.random.PRNGKey(0), y, maps, tes, sens, mask, gamma)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        b1.init(jax.random.PRNGKey(0), y, maps, tes, sens, mask, gamma)
    )
    _, m0 = b0.apply(v, y, maps, tes, sens, mask, gamma)
    _, m1 = b1.apply(v, y, maps, tes, sens, mask, gamma)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=0, atol=1e-5 * float(jnp.abs(m0).max()))


def test_mtlrs_lane_fold_exact():
    """MTLRS folded path equals the standard path. Regression: the
    multi_task_learning adaption adds the seg-weighted magnitude into the
    RIMBlock hidden states, which are carried FOLDED [B, H, W/2, 2f] when
    lane folding is active — the adaption must unfold/refold around the add
    (models/multitask/models.py)."""
    from mridc_tpu.models import build_model

    rng = np.random.default_rng(11)

    def rv(z):
        return np.stack([z.real, z.imag], -1).astype(np.float32)

    B, C, H, W = 1, 2, 12, 16
    y = rv((rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64))
    s = rv((rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64))
    mask = np.zeros((B, 1, H, W), np.float32)
    mask[..., ::2] = 1
    cfg = {
        "model_name": "MTLRS",
        "joint_reconstruction_segmentation_module_cascades": 2,
        "reconstruction_module_num_cascades": 1,
        "reconstruction_module_time_steps": 2,
        "reconstruction_module_conv_filters": [8, 8, 2],
        "reconstruction_module_recurrent_filters": [8, 8, 0],
        "segmentation_module_output_channels": 2,
        "segmentation_module_channels": 8,
        "segmentation_module_pooling_layers": 2,
        "task_adaption_type": "multi_task_learning",
    }
    m0 = build_model({**cfg, "lane_fold": "never"})
    m1 = build_model({**cfg, "lane_fold": "always"})
    v = m0.init(jax.random.PRNGKey(0), y, s, mask)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), y, s, mask)
    )
    out0, seg0 = m0.apply(v, y, s, mask)
    out1, seg1 = m1.apply(v, y, s, mask)
    p0, p1 = np.asarray(out0.prediction), np.asarray(out1.prediction)
    np.testing.assert_allclose(p1, p0, rtol=0, atol=1e-5 * np.abs(p0).max())
    np.testing.assert_allclose(
        np.asarray(seg1), np.asarray(seg0), rtol=0, atol=1e-5 * max(float(np.abs(np.asarray(seg0)).max()), 1e-6)
    )
