"""Project tooling on synthetic fixtures: CC359 mask attachment, dataset-json
splits, offline evaluation, recon plots, AHEAD preprocessing/reformat, and the
Herraez phase unwrap."""

import importlib.util
import json
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, REPO / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_unwrap_phase_recovers_smooth_phase():
    from mridc_tpu.ops.unwrap import unwrap_phase, unwrap_phase_2d

    yy, xx = np.mgrid[0:64, 0:64]
    true = 0.2 * xx + 0.1 * yy + 6 * np.exp(-((xx - 30) ** 2 + (yy - 30) ** 2) / 300.0)
    wrapped = np.angle(np.exp(1j * true))
    u = unwrap_phase_2d(wrapped)
    d = u - true
    d -= d.mean()
    assert np.abs(d).max() < 1e-6  # exact up to a global constant

    vol = np.stack([true * s for s in (0.5, 0.8)])
    uv = unwrap_phase(np.angle(np.exp(1j * vol)))
    for i in range(2):
        dv = uv[i] - vol[i]
        assert np.abs(dv - dv.mean()).max() < 1e-6


def test_compute_masks_cc359(tmp_path):
    cm = _load("projects/reconstruction/datasets/CC359/compute_masks.py", "cc359_masks")
    data_dir = tmp_path / "data"
    masks_dir = tmp_path / "masks"
    out_dir = tmp_path / "out"
    data_dir.mkdir(), masks_dir.mkdir()
    n_slices, h, w = 37, 24, 20
    with h5py.File(data_dir / "vol1.h5", "w") as f:
        f.create_dataset("kspace", data=np.zeros((n_slices, h, w, 4), np.complex64))
    rng = np.random.default_rng(0)
    for acc in (5, 10):
        np.save(masks_dir / f"R{acc}_{h}x{w}.npy", (rng.random((16, h, w)) > 0.7).astype(np.float32))
    out = cm.main(data_dir, masks_dir, out_dir, seed=0)
    with h5py.File(out / "vol1.h5", "r") as f:
        assert f["mask_5x"].shape == (n_slices, h, w)
        assert f["mask_10x"].shape == (n_slices, h, w)


def test_generate_dataset_json(tmp_path):
    gj = _load("projects/unselfsupervised/generate_dataset_json.py", "gen_json")
    d = tmp_path / "data"
    d.mkdir()
    names = ["p8_transversal.h5", "p9_transversal.h5", "p19_transversal.h5",
             "p2_transversal.h5", "p3_sagittal.h5", "p10_transversal.h5"]
    for n in names:
        (d / n).touch()
    out = tmp_path / "folds"
    train, val, test = gj.main([d], out)
    assert sorted(Path(f).name for f in val) == ["p19_transversal.h5", "p9_transversal.h5"]
    assert sorted(Path(f).name for f in test) == ["p10_transversal.h5", "p8_transversal.h5"]
    assert [Path(f).name for f in train] == ["p2_transversal.h5"]
    assert json.loads((out / "train.json").read_text()) == train


def test_evaluate_and_plot_reconstructions(tmp_path):
    ev = _load("projects/unselfsupervised/evaluate_reconstruction.py", "eval_recon")
    pr = _load("projects/unselfsupervised/plot_recons.py", "plot_recons")
    tdir, rdir = tmp_path / "targets", tmp_path / "recons"
    tdir.mkdir(), rdir.mkdir()
    rng = np.random.default_rng(1)
    vol = np.abs(rng.standard_normal((3, 32, 32))).astype(np.float32)
    with h5py.File(tdir / "a.h5", "w") as f:
        f.create_dataset("reconstruction", data=vol)
    with h5py.File(rdir / "a.h5", "w") as f:
        f.create_dataset("reconstruction", data=vol + 0.01 * rng.standard_normal(vol.shape).astype(np.float32))
    m = ev.evaluate(tdir, rdir)
    means = m.means()
    assert means["SSIM"] > 0.8 and means["PSNR"] > 25

    pngs = pr.plot(tdir, [rdir], ["method"], tmp_path / "plots", slices=[1])
    assert pngs and pngs[0].exists()


def test_ahead_preprocessing_pipeline(tmp_path):
    pre = _load("projects/quantitative/datasets/ahead/preprocessing.py", "ahead_pre")
    rng = np.random.default_rng(2)
    E, X, Y, Z, C = 4, 12, 10, 8, 3
    # synthetic echo train with known B0 slope: phase = 2*pi*B0*TE*1e-3
    b0_true = 40.0 * np.exp(-((np.mgrid[0:X, 0:Y, 0:Z][0] - 6) ** 2) / 30.0)
    sense = (rng.standard_normal((X, Y, Z, C)) + 1j * rng.standard_normal((X, Y, Z, C))).astype(np.complex64)
    sense /= np.sqrt((np.abs(sense) ** 2).sum(-1, keepdims=True))
    mag = 1.0 + np.abs(rng.standard_normal((X, Y, Z))).astype(np.float64)
    coilimgs = np.stack(
        [(mag * np.exp(1j * b0_true * te * pre.SCALING))[..., None] * sense for te in pre.TES], 0
    )
    mask_brain = np.ones((X, Y, Z), np.float32)
    b0 = pre.b0_mapping(coilimgs, sense, mask_brain)
    # slope recovered over the brain (fit uses the first echo pair)
    assert np.abs(b0 - b0_true).max() < 1e-3 * max(1.0, np.abs(b0_true).max())

    ksp = pre.generate_2d_kspace(coilimgs, 0)
    assert ksp.shape == coilimgs.shape
    files = pre.save_subject_slices(coilimgs, sense, mask_brain, b0, 7, tmp_path / "slices",
                                    half_nr_of_slices=2)
    assert files
    with h5py.File(files[0], "r") as f:
        assert {"ksp", "sense", "B0map", "mask_brain"} <= set(f.keys())


def test_ahead_reformat(tmp_path):
    rf = _load("projects/quantitative/datasets/ahead/reformat.py", "ahead_reformat")
    root = tmp_path / "in" / "Subcortex_0007_R02_inv2" / "axial"
    root.mkdir(parents=True)
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((6, 6)).astype(np.float32)
    with h5py.File(root / "Subcortex_0007_axial_3.h5", "w") as f:
        f.create_dataset("ksp", data=arr.astype(np.complex64))
        f.create_dataset("sense", data=arr.astype(np.complex64))
        f.create_dataset("mask_brain", data=arr)
    with h5py.File(root / "Subcortex_0007_axial_3_maps.h5", "w") as f:
        for q in ("B0_map", "R2star_map", "S0_map", "phi_map"):
            f.create_dataset(f"{q}_target", data=arr)
            f.create_dataset(f"{q}_init_5", data=arr)
            f.create_dataset(f"{q}_recon_sense_5_5x", data=arr)
        f.create_dataset("subsampling_mask_a_5", data=arr)
    written = rf.reformat(tmp_path / "in", tmp_path / "out", "train")
    assert written
    with h5py.File(written[0], "r") as f:
        keys = set(f.keys())
        assert "R2star_map_target" in keys and "kspace" in keys and "sensitivity_map" in keys


def test_edit_trainedmodel_files(tmp_path):
    """Key-rename utility across run artifacts incl. .mridc archives
    (reference projects/unselfsupervised/edit_trainedmodel_files.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "edit_tm", "projects/unselfsupervised/edit_trainedmodel_files.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    run = tmp_path / "run1"
    run.mkdir()
    (run / "mridc_log_globalrank-0_localrank-0.txt").write_text("train eval_loss_fn=l1\n")
    (run / "config.yaml").write_text("model:\n  eval_loss_fn: l1\n  lr: 0.001\n")
    from mridc_tpu.train.checkpoints import load_archive, save_archive

    save_archive(tmp_path / "m.mridc", {"eval_loss_fn": "l1", "model_name": "ZF"}, {"w": np.zeros(2, np.float32)})

    n = mod.edit_run_dir(run, "eval_loss_fn", "val_loss_fn", verbose=False)
    assert n == 3
    assert "val_loss_fn" in (run / "config.yaml").read_text()
    assert "eval_loss_fn" not in (run / "mridc_log_globalrank-0_localrank-0.txt").read_text()
    cfg, weights = load_archive(tmp_path / "m.mridc")
    assert cfg == {"val_loss_fn": "l1", "model_name": "ZF"}
    from flax import serialization

    tree = serialization.msgpack_restore(weights)
    np.testing.assert_array_equal(tree["w"], np.zeros(2, np.float32))

    # idempotent: nothing left to change
    assert mod.edit_run_dir(run, "eval_loss_fn", "val_loss_fn", verbose=False) == 0
