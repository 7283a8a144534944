"""Dataset + batcher tests on the synthetic fixture (reference test strategy:
SURVEY.md §4 — mock h5 fastMRI data, shape-parametrized assertions)."""

import numpy as np
import pytest

from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
from mridc_tpu.data.subsample import create_masker
from mridc_tpu.data.transforms import MRIDataTransforms

from fixtures import create_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mock_fastmri")
    create_dataset(root, n_files=2, slices=3, coils=4, h=64, w=64)
    return root


def _transform(**kw):
    defaults = dict(
        mask_func=[create_masker("random1d", [0.08], [4])],
        normalize_inputs=True,
        normalization_type="max",
        fft_centered=True,
        fft_normalization="ortho",
        coil_combination_method="SENSE",
    )
    defaults.update(kw)
    return MRIDataTransforms(**defaults)


def test_dataset_scan_and_len(dataset_dir):
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=None)
    assert len(ds) == 6  # 2 files x 3 slices
    kspace, sens, mask, pred, target, attrs, fname, sidx = ds[0]
    assert kspace.shape == (4, 64, 64)
    assert sens.shape == (4, 64, 64)
    assert target.shape == (64, 64)
    assert attrs["padding_left"] == 0


def test_dataset_with_transform(dataset_dir):
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=_transform())
    out = ds[1]
    assert len(out) == 10


def test_sample_rate(dataset_dir):
    ds = ReconstructionMRIDataset(root=dataset_dir, sample_rate=0.5, transform=None)
    assert len(ds) == 3


def test_consecutive_slices(dataset_dir):
    ds = ReconstructionMRIDataset(root=dataset_dir, consecutive_slices=2, transform=None)
    kspace = ds[0][0]
    assert kspace.shape == (2, 4, 64, 64)
    assert len(ds) == 4  # (3-1) slices per file x 2


def test_batch_loader_shapes(dataset_dir):
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=_transform())
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=0)
    batch = next(iter(loader))
    assert batch["masked_kspace"].shape == (2, 4, 64, 64, 2)
    assert batch["sensitivity_maps"].shape == (2, 4, 64, 64, 2)
    assert batch["target"].shape == (2, 64, 64, 2)
    assert batch["initial_prediction"].shape == (2, 64, 64, 2)
    assert batch["mask"].shape[0] == 2
    assert batch["acceleration"].shape == (2,)
    assert len(batch["fname"]) == 2
    # undersampling actually happened (masked entries ~0 up to the
    # normalization fft round-trip noise)
    mk = np.abs(batch["masked_kspace"])
    assert (mk > 1e-4 * mk.max()).mean() < 0.6


def test_batch_loader_pad_shape(dataset_dir):
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=_transform())
    loader = BatchLoader(ds, batch_size=2, pad_shape=(4, 80, 80))
    batch = next(iter(loader))
    assert batch["masked_kspace"].shape == (2, 4, 80, 80, 2)
    assert batch["target"].shape == (2, 80, 80, 2)


def test_batch_loader_n2r(dataset_dir):
    tfm = _transform(n2r=True, n2r_probability=1.0, n2r_std_devs=(0.1, 0.2), n2r_rhos=(0.4, 0.8))
    ds = ReconstructionMRIDataset(root=dataset_dir, transform=tfm)
    loader = BatchLoader(ds, batch_size=2)
    batch = next(iter(loader))
    assert "n2r_masked_kspace" in batch
    assert batch["n2r_masked_kspace"].shape == batch["masked_kspace"].shape
    assert batch["n2r_mask"].shape[0] == 2
