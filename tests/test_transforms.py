"""Transform-pipeline tests: op semantics + the canonical 10-tuple contract
(reference: mridc/collections/common/parts/transforms.py)."""

import numpy as np
import pytest

from mridc_tpu.data.subsample import RandomMaskFunc, create_masker
from mridc_tpu.data.transforms import (
    Cropper,
    GeometricDecompositionCoilCompression,
    MRIDataTransforms,
    Masker,
    N2R,
    NoisePreWhitening,
    Normalizer,
    SSDU,
    ZeroFilling,
)


def _kspace(coils=4, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((coils, h, w)) + 1j * rng.standard_normal((coils, h, w))).astype(np.complex64)


def test_zero_filling_pads_symmetrically():
    zf = ZeroFilling(zero_filling_size=(48, 40))
    x = _kspace(3, 32, 32)
    out = zf(x, apply_backward_transform=False)
    assert out.shape == (3, 48, 40)
    np.testing.assert_allclose(out[:, 8:40, 4:36], x, rtol=1e-5)


def test_cropper_center_crops():
    c = Cropper(cropping_size=(16, 16))
    x = _kspace(2, 32, 32)
    out = c(x)
    assert out.shape == (2, 16, 16)
    np.testing.assert_allclose(out, x[:, 8:24, 8:24], rtol=1e-6)


def test_cropper_larger_than_input_is_noop():
    c = Cropper(cropping_size=(64, 64))
    x = _kspace(2, 32, 32)
    assert c(x).shape == (2, 32, 32)


def test_normalizer_max():
    n = Normalizer(normalization_type="max")
    x = _kspace()
    out, attrs = n(x)
    assert np.abs(out).max() == pytest.approx(1.0, rel=1e-5)
    assert attrs["max"] == pytest.approx(float(np.abs(x).max()), rel=1e-5)


def test_normalizer_minmax_and_mean():
    x = _kspace()
    out, _ = Normalizer(normalization_type="minmax")(x)
    mag = np.abs(out)
    assert mag.min() >= -1e-6
    out2, attrs2 = Normalizer(normalization_type="mean")(x)
    assert attrs2["std"] > 0


def test_prewhitening_decorrelates():
    rng = np.random.default_rng(3)
    # correlated coil noise
    L = np.array([[1.0, 0], [0.9, 0.5]])
    noise = (rng.standard_normal((2, 64 * 64)) + 1j * rng.standard_normal((2, 64 * 64)))
    data = (L @ noise).reshape(2, 64, 64).astype(np.complex64)
    pw = NoisePreWhitening(find_patch_size=False, patch_size=[0, 30, 0, 30])
    out = pw(data)
    flat = out.reshape(2, -1)
    cov = (flat @ np.conj(flat).T) / (flat.shape[1] - 1)
    # off-diagonal should be tiny relative to diagonal after whitening
    assert abs(cov[0, 1]) / abs(cov[0, 0]) < 0.1


def test_gcc_compresses_and_preserves_energy():
    # build data with true coil rank 2 embedded in 6 coils
    rng = np.random.default_rng(5)
    base = (rng.standard_normal((2, 32, 32)) + 1j * rng.standard_normal((2, 32, 32))).astype(np.complex64)
    mix = rng.standard_normal((6, 2)).astype(np.float32)
    data = np.tensordot(mix, base, axes=(1, 0)).astype(np.complex64)
    gcc = GeometricDecompositionCoilCompression(virtual_coils=2, calib_lines=24)
    out = gcc(data)
    assert out.shape == (2, 32, 32)
    # energy preserved within a few percent (rank-2 data)
    e_in = (np.abs(data) ** 2).sum()
    e_out = (np.abs(out) ** 2).sum()
    assert e_out / e_in > 0.95


def test_masker_with_generator_and_existing():
    x = _kspace(4, 32, 32)
    masker = Masker(mask_func=[RandomMaskFunc([0.08], [4])])
    masked, masks, accs = masker(x, None, (0, 0), seed=42)
    assert len(masked) == 1 and masks[0].shape[-2:] == (32, 1) or masks[0].shape[-1] == 32
    assert accs[0] == 4
    # existing mask path
    m = np.ones((32, 32), np.float32)
    masked2, masks2, accs2 = masker(x, m, (0, 0))
    np.testing.assert_allclose(masked2[0], x)


def test_ssdu_masks_are_disjoint_and_cover():
    rng = np.random.RandomState(0)
    mask = (rng.rand(32, 32) < 0.4).astype(np.float32)
    ssdu = SSDU(mask_type="Uniform", rho=0.4, rng=rng)
    train, loss = ssdu(mask)
    assert ((train == 1) & (loss == 1) & (mask == 1)).sum() <= ssdu.acs_block_size[0] * ssdu.acs_block_size[1]
    np.testing.assert_array_equal(np.maximum(train, loss), mask)


def test_n2r_returns_ones_when_probability_zero():
    n2r = N2R(probability=0.0)
    data = _kspace(2, 16, 16)
    mask = np.ones((1, 16, 16, 1), np.float32)
    out = n2r(data, mask)
    np.testing.assert_array_equal(out, np.ones((1, 16, 16), np.float32))


def test_full_transform_returns_ten_tuple():
    kspace = _kspace(4, 32, 32)
    sens = _kspace(4, 32, 32, seed=1)
    tfm = MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.08], [4])],
        crop_size=(24, 24),
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
        coil_combination_method="SENSE",
    )
    out = tfm(kspace, sens, None, None, None, {}, "file_x.h5", 0)
    assert len(out) == 10
    k, mk, s, m, pred, tgt, fname, sidx, acc, attrs = out
    assert k.shape == (4, 24, 24)
    assert isinstance(mk, list) and mk[0].shape == (4, 24, 24)
    assert s.shape == (4, 24, 24)
    assert (isinstance(pred, list) and pred[0].shape == (24, 24)) or pred.shape == (24, 24)
    assert tgt.shape == (24, 24)
    assert fname == "file_x.h5" and sidx == 0
    assert acc[0] == 4
    assert "target_max" in attrs

    # seeded by fname -> deterministic
    out2 = tfm(kspace, sens, None, None, None, {}, "file_x.h5", 0)
    np.testing.assert_allclose(np.asarray(out[1][0]), np.asarray(out2[1][0]), rtol=1e-6)


def test_transform_ssdu_path():
    kspace = _kspace(4, 32, 32)
    sens = _kspace(4, 32, 32, seed=1)
    tfm = MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.08], [4])],
        ssdu=True,
        ssdu_mask_type="Uniform",
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
    )
    k, mk, s, m, pred, tgt, fname, sidx, acc, attrs = tfm(kspace, sens, None, None, None, {}, "f.h5", 0)
    # ssdu: mask entries are [train, loss]
    assert isinstance(m[0], list) and len(m[0]) == 2
    train, loss = m[0]
    assert train.shape[-2:] == (32, 32)


def test_masker_3d_per_slice():
    rng = np.random.default_rng(7)
    data = (rng.standard_normal((3, 4, 32, 32)) + 1j * rng.standard_normal((3, 4, 32, 32))).astype(np.complex64)
    masker = Masker(mask_func=[RandomMaskFunc([0.08], [4])], dimensionality=3, remask=True)
    masked, masks, accs = masker(data, None, (0, 0), seed=None)
    assert masked[0].shape == (3, 4, 32, 32)
    assert masks[0].shape[0] == 3
    # remask=True -> per-slice masks differ (unseeded)
    assert not np.array_equal(masks[0][0], masks[0][1]) or not np.array_equal(masks[0][1], masks[0][2])
    # remask=False -> identical masks
    masker2 = Masker(mask_func=[RandomMaskFunc([0.08], [4])], dimensionality=3, remask=False)
    _, masks2, _ = masker2(data, None, (0, 0), seed=None)
    np.testing.assert_array_equal(masks2[0][0], masks2[0][1])


def test_transform_ssdu_multi_acceleration_targets_follow_selection():
    """SSDU with multiple accelerations keeps per-acceleration targets as a
    list so the loader pairs target[r] with the selected input (reference
    nn/base.py:337-340)."""
    kspace = _kspace(3, 32, 32)
    sens = _kspace(3, 32, 32, seed=1)
    tfm = MRIDataTransforms(
        mask_func=[create_masker("random1d", [0.08], [4]), create_masker("random1d", [0.08], [8])],
        ssdu=True,
        ssdu_mask_type="Uniform",
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
        coil_combination_method="SENSE",
    )
    out = tfm(kspace, sens, None, None, None, {}, "file_multi.h5", 0)
    target = out[5]
    assert isinstance(target, list) and len(target) == 2
    assert not np.allclose(np.asarray(target[0]), np.asarray(target[1]))


def test_transform_ssdu_n2r_restores_original_input():
    """ssdu+n2r: the model input reverts to the ORIGINAL undersampled kspace
    and sampling mask; the ssdu split survives only as the loss mask
    (reference transforms.py:2076-2104)."""
    kspace = _kspace(3, 32, 32)
    sens = _kspace(3, 32, 32, seed=1)
    common = dict(
        mask_func=[create_masker("random1d", [0.08], [4])],
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
        coil_combination_method="SENSE",
    )
    plain = MRIDataTransforms(**common)
    both = MRIDataTransforms(
        ssdu=True, ssdu_mask_type="Uniform", n2r=True, n2r_probability=1.0,
        n2r_std_devs=(0.1, 0.1), n2r_rhos=(0.4, 0.4), **common,
    )
    base = plain(kspace, sens, None, None, None, {}, "file_sn.h5", 0)
    out = both(kspace, sens, None, None, None, {}, "file_sn.h5", 0)
    mk = out[1]
    assert isinstance(mk, list) and len(mk) == 2  # [clean, n2r]
    # clean input == the plain undersampled kspace (not ssdu-train-masked)
    np.testing.assert_allclose(np.asarray(mk[0][0]), np.asarray(base[1][0]), rtol=1e-5, atol=1e-7)
    # train mask part == the original sampling mask
    m = out[3][0][0]  # [clean, n2r] -> acc 0 -> [train, loss]
    np.testing.assert_allclose(np.asarray(m[0]).squeeze(), np.asarray(base[3][0]).squeeze(), atol=1e-6)


def test_normalizer_skips_all_ones():
    """Auto-initialized all-ones sensitivity maps pass through the normalizer
    unchanged (reference skips tensors with mean == 1, transforms.py:1478)."""
    from mridc_tpu.data.transforms import Normalizer

    ones = np.ones((3, 16, 16), np.complex64)
    for kind in ("max", "mean", "minmax"):
        out, attrs = Normalizer(normalization_type=kind)(ones)
        np.testing.assert_array_equal(np.asarray(out), ones)


def test_ssdu_export_and_reuse_masks(tmp_path, monkeypatch):
    """export_and_reuse_masks persists the (train, loss) split and reuses it
    for the same file (reference transforms.py:1020-1045)."""
    from mridc_tpu.data.transforms import SSDU

    monkeypatch.setenv("MRIDC_SSDU_MASK_DIR", str(tmp_path))
    rng = np.random.RandomState(0)
    mask2d = (np.random.RandomState(1).rand(32, 32) > 0.5).astype(np.float32)
    ssdu = SSDU(mask_type="Uniform", export_and_reuse_masks=True, rng=rng)
    t1, l1 = ssdu(mask2d, "vol1.h5")
    t2, l2 = ssdu(mask2d, "vol1.h5")  # would differ without reuse (rng advanced)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(l1, l2)
    assert (tmp_path / "vol1.npy").exists()
