"""Parity tests for the FFT/complex/coil-combination physics core.

The oracle is torch (CPU), used to re-state the reference's semantics
(reference: mridc/collections/common/parts/fft.py, parts/utils.py) on the
real-view layout; we adapt layouts and compare numerically.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mridc_tpu.ops import (
    center_crop,
    center_crop_to_smallest,
    coil_combination,
    fft2,
    from_real_view,
    ifft2,
    mask_center,
    batched_mask_center,
    rss,
    sense,
    to_real_view,
)


def _rand_complex(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


def _torch_fft2(x_np, centered, norm, inverse=False):
    """Reference semantics via torch on native complex tensors."""
    t = torch.from_numpy(x_np)
    dims = (-2, -1)
    if centered:
        t = torch.fft.ifftshift(t, dim=dims)
    fn = torch.fft.ifft2 if inverse else torch.fft.fft2
    t = fn(t, dim=dims, norm=norm)
    if centered:
        t = torch.fft.fftshift(t, dim=dims)
    return t.numpy()


@pytest.mark.parametrize("centered", [False, True])
@pytest.mark.parametrize("norm", ["backward", "ortho", "forward"])
@pytest.mark.parametrize("shape", [(2, 4, 16, 18), (3, 15, 17)])
def test_fft2_matches_reference(centered, norm, shape):
    rng = np.random.default_rng(42)
    x = _rand_complex(rng, shape)
    got = np.asarray(fft2(jnp.asarray(x), centered=centered, normalization=norm))
    want = _torch_fft2(x, centered, norm)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("centered", [False, True])
@pytest.mark.parametrize("norm", ["backward", "ortho"])
def test_ifft2_matches_reference(centered, norm):
    rng = np.random.default_rng(7)
    x = _rand_complex(rng, (2, 4, 20, 22))
    got = np.asarray(ifft2(jnp.asarray(x), centered=centered, normalization=norm))
    want = _torch_fft2(x, centered, norm, inverse=True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fft_roundtrip():
    rng = np.random.default_rng(3)
    x = _rand_complex(rng, (1, 8, 32, 32))
    y = ifft2(fft2(jnp.asarray(x), centered=True, normalization="ortho"), centered=True, normalization="ortho")
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-4, atol=1e-5)


def test_real_view_roundtrip():
    rng = np.random.default_rng(5)
    x = _rand_complex(rng, (2, 3, 8, 8))
    rv = to_real_view(jnp.asarray(x))
    assert rv.shape == (2, 3, 8, 8, 2)
    back = from_real_view(rv)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-6, atol=1e-6)


def test_rss_and_sense_match_reference():
    rng = np.random.default_rng(11)
    x = _rand_complex(rng, (2, 5, 12, 14))
    s = _rand_complex(rng, (2, 5, 12, 14))

    # reference rss_complex: sqrt(sum over coils of |x|^2)
    want_rss = np.sqrt((np.abs(x) ** 2).sum(axis=1))
    np.testing.assert_allclose(np.asarray(rss(jnp.asarray(x), dim=1)), want_rss, rtol=1e-5, atol=1e-5)

    # reference sense: sum_c x_c * conj(S_c)
    want_sense = (x * np.conj(s)).sum(axis=1)
    got = np.asarray(sense(jnp.asarray(x), jnp.asarray(s), dim=1))
    np.testing.assert_allclose(got, want_sense, rtol=1e-4, atol=1e-4)

    got2 = np.asarray(coil_combination(jnp.asarray(x), jnp.asarray(s), method="SENSE", dim=1))
    np.testing.assert_allclose(got2, want_sense, rtol=1e-4, atol=1e-4)
    got3 = np.asarray(coil_combination(jnp.asarray(x), jnp.asarray(s), method="RSS", dim=1))
    np.testing.assert_allclose(got3, want_rss, rtol=1e-5, atol=1e-5)


def test_center_crop_matches_reference():
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 3, 17, 19)).astype(np.float32)
    got = np.asarray(center_crop(jnp.asarray(x), (8, 9)))
    # reference: w_from = (H - h) // 2 (trunc)
    top, left = (17 - 8) // 2, (19 - 9) // 2
    np.testing.assert_array_equal(got, x[..., top : top + 8, left : left + 9])

    y = rng.standard_normal((2, 3, 11, 25)).astype(np.float32)
    cx, cy = center_crop_to_smallest(jnp.asarray(x), jnp.asarray(y))
    assert cx.shape[-2:] == (11, 19)
    assert cy.shape[-2:] == (11, 19)


def test_mask_center():
    rng = np.random.default_rng(17)
    x = _rand_complex(rng, (2, 3, 10, 12))
    got = np.asarray(mask_center(jnp.asarray(x), 3, 7, mask_type="2D"))
    want = np.zeros_like(x)
    want[..., 3:7, :] = x[..., 3:7, :]
    np.testing.assert_array_equal(got, want)

    got1d = np.asarray(mask_center(jnp.asarray(x), 2, 5, mask_type="1D"))
    want1d = np.zeros_like(x)
    want1d[..., :, 2:5] = x[..., :, 2:5]
    np.testing.assert_array_equal(got1d, want1d)


def test_batched_mask_center():
    rng = np.random.default_rng(19)
    x = _rand_complex(rng, (3, 2, 8, 8))
    frm = np.array([1, 2, 3])
    to = np.array([5, 6, 7])
    # the reference's batched branch always bands dim 3 (W) regardless of
    # mask_type (utils.py:509 ``mask[i, :, :, start:end]``)
    got = np.asarray(batched_mask_center(jnp.asarray(x), frm, to, mask_type="2D"))
    want = np.zeros_like(x)
    for i in range(3):
        want[i, :, :, frm[i] : to[i]] = x[i, :, :, frm[i] : to[i]]
    np.testing.assert_array_equal(got, want)

    # length-1 bounds dispatch to mask_center semantics (type-dependent axis)
    got1 = np.asarray(batched_mask_center(jnp.asarray(x), np.array([2]), np.array([6]), mask_type="2D"))
    want1 = np.zeros_like(x)
    want1[:, :, 2:6] = x[:, :, 2:6]
    np.testing.assert_array_equal(got1, want1)


# ---------------------------------------------------------------------------
# PSF-1D data consistency (nn/dc.py): for 1D column masks the normal operator
# IFFT2(mask * FFT2(x)) collapses to one [W, W] matmul along the readout axis.
# These tests pin the exactness of that identity (the TPU inference fast path).
# ---------------------------------------------------------------------------


def _dc_inputs(rng, b=2, c=3, h=16, w=20):
    def rv(x):
        return np.stack([x.real, x.imag], axis=-1).astype(np.float32)

    y = rv(_rand_complex(rng, (b, c, h, w)))
    sens = rv(_rand_complex(rng, (b, c, h, w)))
    eta = rv(_rand_complex(rng, (b, h, w)))
    mask = np.zeros((b, 1, h, w), np.float32)
    mask[..., ::3] = 1.0
    mask[..., w // 2 - 3 : w // 2 + 3] = 1.0
    mask[1, ..., ::2] = 1.0  # different mask per example: mats are batched
    return jnp.asarray(y), jnp.asarray(sens), jnp.asarray(eta), jnp.asarray(mask)


@pytest.mark.parametrize("centered", [False, True])
@pytest.mark.parametrize("norm", ["backward", "ortho", "forward"])
def test_psf1d_gradient_matches_full_path(centered, norm):
    from mridc_tpu.nn.dc import (
        expand_rv_mask,
        log_likelihood_gradient,
        log_likelihood_gradient_psf1d,
        psf1d_gauss_mats,
        sens_reduce,
    )

    rng = np.random.default_rng(23)
    y, sens, eta, mask = _dc_inputs(rng)
    full = log_likelihood_gradient(eta, y, sens, expand_rv_mask(mask), 1.0, centered, norm)
    mats = psf1d_gauss_mats(mask[:, 0, 0, :], centered, norm)
    z0 = sens_reduce(expand_rv_mask(mask) * y, sens, centered, norm)
    fast = log_likelihood_gradient_psf1d(eta, sens, mats, z0, 1.0)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full), rtol=0, atol=2e-4)


def test_cirim_psf1d_matches_full_model():
    """End-to-end: a CIRIM built with dc_mode=psf1d reproduces the full-DC
    model's prediction with identical weights (exact identity, fp noise only)."""
    import jax

    from mridc_tpu.models import build_model

    rng = np.random.default_rng(29)
    y, sens, eta, mask = _dc_inputs(rng, b=2, c=2, h=16, w=16)
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
    m_full = build_model(cfg)
    m_fast = build_model({**cfg, "dc_mode": "psf1d"})
    variables = m_full.init(jax.random.PRNGKey(0), y, sens, mask)
    p_full = np.asarray(m_full.apply(variables, y, sens, mask).prediction)
    p_fast = np.asarray(m_fast.apply(variables, y, sens, mask).prediction)
    scale = np.abs(p_full).max()
    np.testing.assert_allclose(p_fast, p_full, rtol=0, atol=5e-4 * scale)


def test_cirim_infer_dc_dtype_default_and_quality():
    """infer_dc_dtype defaults to compute_dtype (like train_dc_dtype), an
    explicit null forces f32 DC, and the bf16 DC chain stays within the
    mixed-precision budget of the f32 psf1d path at inference."""
    import jax

    from mridc_tpu.models import build_model

    rng = np.random.default_rng(31)
    y, sens, _, mask = _dc_inputs(rng, b=2, c=2, h=16, w=16)
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
        "dc_mode": "psf1d",
    }
    assert build_model({**cfg, "compute_dtype": "bfloat16"}).infer_dc_dtype == "bfloat16"
    assert build_model({**cfg, "compute_dtype": "bfloat16", "infer_dc_dtype": None}).infer_dc_dtype is None
    assert build_model(cfg).infer_dc_dtype is None

    m_f32 = build_model(cfg)
    m_bf16 = build_model({**cfg, "infer_dc_dtype": "bfloat16"})
    variables = m_f32.init(jax.random.PRNGKey(0), y, sens, mask)
    p_f32 = np.asarray(m_f32.apply(variables, y, sens, mask).prediction)
    p_bf16 = np.asarray(m_bf16.apply(variables, y, sens, mask).prediction)
    scale = np.abs(p_f32).max()
    assert np.linalg.norm(p_bf16 - p_f32) < 2e-2 * np.linalg.norm(p_f32)
    np.testing.assert_allclose(p_bf16, p_f32, rtol=0, atol=5e-2 * scale)


def test_dc_mode_unknown_rejected():
    import pytest as _pytest

    from mridc_tpu.models import build_model

    base = {"model_name": "CIRIM", "dc_mode": "warp"}
    with _pytest.raises(ValueError, match="dc_mode"):
        build_model(base)
    with _pytest.raises(ValueError, match="dc_mode"):
        build_model({
            "model_name": "MTLRS", "dc_mode": "warp",
            "segmentation_module": "unet", "segmentation_module_output_channels": 2,
        })
