"""Mask-generator tests: shape, acceleration, determinism, and bit-parity of the
seeded generators with the reference RNG recipe (reference:
mridc/collections/common/data/subsample.py)."""

import numpy as np
import pytest

from mridc_tpu.data.subsample import (
    Equispaced1DMaskFunc,
    Equispaced2DMaskFunc,
    Gaussian1DMaskFunc,
    Gaussian2DMaskFunc,
    Poisson2DMaskFunc,
    RandomMaskFunc,
    create_masker,
    temp_seed,
)


SHAPE = (1, 64, 96, 2)  # reference layout: [..., rows, cols, complex]


@pytest.mark.parametrize(
    "masker_name, mask_dims",
    [
        ("random1d", "1d"),
        ("equispaced1d", "1d"),
        ("equispaced2d", "2d"),
        ("gaussian1d", "1d"),
        ("gaussian2d", "2d"),
    ],
)
def test_shapes_and_acceleration(masker_name, mask_dims):
    cf = [0.7, 0.7] if "gaussian" in masker_name else [0.08, 0.04]
    masker = create_masker(masker_name, cf, [4, 8])
    mask, acc = masker(SHAPE, seed=123)
    assert acc in (4, 8)
    if mask_dims == "1d":
        assert mask.shape == (1, 1, 96, 1)
    else:
        assert mask.shape == (1, 64, 96, 1)
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # deterministic under the same seed
    mask2, acc2 = masker(SHAPE, seed=123)
    np.testing.assert_array_equal(mask, np.asarray(mask2))
    assert acc == acc2


def test_random1d_bit_parity_with_reference_rng():
    """Replicates the reference algorithm inline and checks bit-identity."""
    masker = RandomMaskFunc([0.08], [4])
    mask, acc = masker(SHAPE, seed=42)

    rng = np.random.RandomState()
    state = rng.get_state()
    rng.seed(42)
    num_cols = SHAPE[-2]
    choice = rng.randint(0, 1)
    center_fraction, acceleration = 0.08, 4
    num_low_freqs = int(round(num_cols * center_fraction))
    prob = (num_cols / acceleration - num_low_freqs) / (num_cols - num_low_freqs)
    want = rng.uniform(size=num_cols) < prob
    pad = (num_cols - num_low_freqs + 1) // 2
    want[pad : pad + num_low_freqs] = True
    rng.set_state(state)

    np.testing.assert_array_equal(np.asarray(mask).squeeze(), want.astype(np.float32))
    assert acc == 4


def test_equispaced1d_center_band():
    masker = Equispaced1DMaskFunc([0.1], [4])
    mask, _ = masker((1, 32, 100, 2), seed=0)
    m = np.asarray(mask).squeeze()
    num_low = int(round(100 * 0.1))
    pad = (100 - num_low + 1) // 2
    assert m[pad : pad + num_low].all()
    # roughly 25 columns sampled
    assert 20 <= m.sum() <= 45


def test_equispaced2d_reports_full_acceleration():
    masker = Equispaced2DMaskFunc([0.08], [8])
    mask, acc = masker((1, 64, 64, 2), seed=1)
    assert acc == 8
    assert np.asarray(mask).squeeze().shape == (64, 64)


def test_gaussian2d_center_ellipse_fully_sampled():
    masker = Gaussian2DMaskFunc([0.7], [4])
    mask, _ = masker((1, 64, 64, 2), seed=3, scale=0.1)
    m = np.asarray(mask).squeeze()
    assert m[32, 32] == 1.0
    assert m[32, 30] == 1.0


def test_poisson2d_hits_acceleration():
    masker = Poisson2DMaskFunc([0.7], [6])
    mask, acc = masker((1, 48, 48, 2), seed=5)
    m = np.asarray(mask).squeeze()
    actual = m.size / m.sum()
    assert abs(actual - 6) < 2.0  # center circle lowers the realized acceleration
    assert m[24, 24] == 1.0


def test_temp_seed_restores_state():
    rng = np.random.RandomState(7)
    before = rng.randint(0, 1000)
    rng = np.random.RandomState(7)
    with temp_seed(rng, 999):
        rng.uniform(size=10)
    after = rng.randint(0, 1000)
    assert before == after


def test_create_masker_unknown():
    with pytest.raises(NotImplementedError):
        create_masker("nope", [0.1], [4])
