"""CLI entry-point tests (reference style: subprocess config runs,
tests/hydra/test_hydra_runner.py:13-77) plus use_sens_net wrapping."""

import pytest

pytestmark = pytest.mark.slow

import subprocess
import sys

import jax
import numpy as np
import pytest
import yaml

from fixtures import create_dataset
from mridc_tpu.models import build_model


def _write_cfg(tmp_path, data_dir, model_extra=None, mode="train"):
    model = {
        "model_name": "UNet",
        "channels": 4,
        "pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
        "coil_combination_method": "SENSE",
        "train_loss_fn": "l1",
        "optim": {"name": "adam", "lr": 1e-3},
        "train_ds": {
            "data_path": str(data_dir),
            "batch_size": 4,
            "shuffle": True,
            "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
            "fft_centered": True,
            "fft_normalization": "ortho",
        },
        "test_ds": {
            "data_path": str(data_dir),
            "batch_size": 4,
            "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
            "fft_centered": True,
            "fft_normalization": "ortho",
        },
    }
    model.update(model_extra or {})
    cfg = {
        "mode": mode,
        "model": model,
        "trainer": {"max_epochs": 1},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "t"},
    }
    path = tmp_path / "conf.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    create_dataset(root, n_files=1, slices=2, coils=4, h=32, w=32)
    return root


def test_run_from_config_train(tmp_path, data_dir):
    from mridc_tpu.launch import run_from_config
    from mridc_tpu.train.config import load_config

    cfg_path = _write_cfg(tmp_path, data_dir)
    cfg = load_config(cfg_path)
    trainer, history = run_from_config(cfg)
    assert np.isfinite(history[-1]["train_loss"])
    run_dirs = list((tmp_path / "exp" / "t").iterdir())
    assert run_dirs
    contents = {p.name for p in run_dirs[0].iterdir()}
    assert "config.yaml" in contents
    assert "checkpoints" in contents or "t.mridc" in contents


def test_run_from_config_test_mode(tmp_path, data_dir):
    from mridc_tpu.launch import run_from_config
    from mridc_tpu.train.config import load_config

    cfg = load_config(_write_cfg(tmp_path, data_dir, mode="test"))
    trainer, means = run_from_config(cfg)
    assert "SSIM" in means
    run_dirs = list((tmp_path / "exp" / "t").iterdir())
    recon_files = list((run_dirs[0] / "reconstructions").glob("*.h5"))
    assert recon_files


def test_cli_subprocess_invalid_config(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("mode: train\nmodel: {model_name: NOPE}\n")
    proc = subprocess.run(
        [sys.executable, "-m", "mridc_tpu.launch", "--config-path", str(tmp_path), "--config-name", "bad.yaml"],
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        timeout=180,
    )
    assert proc.returncode != 0
    assert "Unknown model_name" in proc.stderr


def test_use_sens_net_wrapping():
    cfg = {
        "model_name": "VN",
        "num_cascades": 1,
        "channels": 4,
        "pooling_layers": 2,
        "use_sens_net": True,
        "sens_chans": 4,
        "sens_pools": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    y = rng.standard_normal((1, 3, 32, 32, 2)).astype(np.float32)
    sens = rng.standard_normal((1, 3, 32, 32, 2)).astype(np.float32)
    mask = np.ones((1, 1, 32, 32), np.float32)
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    out = model.apply(variables, y, sens, mask)
    assert out.prediction.shape == (1, 32, 32, 2)
    # sens net params exist
    assert any("SensitivityModel" in k for k in variables["params"])


def test_checkpoint_resume(tmp_path, data_dir):
    """ExpManager.maybe_resume restores the latest orbax checkpoint
    (reference exp_manager resume_if_exists, exp_manager.py:401-471)."""
    import jax

    from mridc_tpu.models import build_model as bm
    from mridc_tpu.train.exp_manager import ExpManager
    from mridc_tpu.train.trainer import Trainer

    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = bm(cfg)
    exp = ExpManager(exp_dir=str(tmp_path / "exp"), name="resume_test", version="v1", model_config=cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=exp)

    from mridc_tpu.data.factory import build_dataloader

    loader = build_dataloader(
        {"data_path": str(data_dir), "batch_size": 4,
         "mask_args": {"type": "random1d", "accelerations": [4], "center_fractions": [0.08]},
         "fft_centered": True, "fft_normalization": "ortho"},
        cfg,
    )
    batch = next(iter(loader))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.training_batch(batch)
    trainer.training_batch(batch)
    exp.checkpointer.save(int(trainer.state.step), trainer.state, {"val_loss": 0.5})
    saved_step = int(trainer.state.step)
    saved_params = jax.device_get(trainer.state.params)

    # fresh trainer + resume
    exp2 = ExpManager(exp_dir=str(tmp_path / "exp"), name="resume_test", version="v1",
                      resume_if_exists=True, model_config=cfg)
    trainer2 = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=exp2)
    trainer2.setup_optimization()
    trainer2.init_state(jax.random.PRNGKey(1), batch)
    assert exp2.maybe_resume(trainer2)
    assert int(trainer2.state.step) == saved_step
    import numpy as np

    leaves1 = jax.tree_util.tree_leaves(saved_params)
    leaves2 = jax.tree_util.tree_leaves(jax.device_get(trainer2.state.params))
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(a, b)


def test_exp_manager_provenance_and_last_checkpoint(tmp_path, loaders_small=None):
    """Provenance files (git sha + full diff, cmd args) and the unmanaged
    'last' checkpoint path (reference exp_manager.py:347-356, :704)."""
    import jax
    import numpy as np

    from mridc_tpu.models import build_model
    from mridc_tpu.train.exp_manager import ExpManager
    from mridc_tpu.train.trainer import Trainer

    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    exp = ExpManager(exp_dir=str(tmp_path / "exp"), name="prov", version="v1", model_config=cfg)
    gi = exp.log_dir / "git-info.log"
    assert gi.exists() and gi.read_text().startswith("commit: ")
    assert "# git diff HEAD" in gi.read_text()
    assert (exp.log_dir / "cmd-args.log").exists()

    model = build_model(cfg)
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=exp)
    from fixtures import create_dataset
    from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
    from mridc_tpu.data.subsample import create_masker
    from mridc_tpu.data.transforms import MRIDataTransforms

    root = tmp_path / "d"
    create_dataset(root, n_files=1, slices=2, coils=2, h=16, w=16)
    tfm = MRIDataTransforms(mask_func=[create_masker("random1d", [0.16], [4])],
                            fft_centered=True, fft_normalization="ortho")
    loader = BatchLoader(ReconstructionMRIDataset(root=root, transform=tfm), batch_size=2)
    batch = next(iter(loader))
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.training_batch(batch)
    exp.on_train_end(trainer)
    assert (exp.checkpoint_dir / "last").exists()

    # a metric-less end save must not enter the managed top-k set
    assert exp.checkpointer.latest_step() is None

    # resume prefers the newest state, including the unmanaged last
    exp2 = ExpManager(exp_dir=str(tmp_path / "exp"), name="prov", version="v1",
                      resume_if_exists=True, model_config=cfg)
    trainer2 = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=exp2)
    trainer2.setup_optimization()
    trainer2.init_state(jax.random.PRNGKey(1), batch)
    assert exp2.maybe_resume(trainer2)
    assert int(trainer2.state.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exp_manager_rotates_logs_on_resume(tmp_path):
    from mridc_tpu.train.exp_manager import ExpManager

    exp = ExpManager(exp_dir=str(tmp_path / "exp"), name="rot", version="v1")
    # simulate a prior run's log file
    (exp.log_dir / "stale.log").write_text("old logs")
    exp2 = ExpManager(exp_dir=str(tmp_path / "exp"), name="rot", version="v1", resume_if_exists=True)
    rotated = list(exp2.log_dir.glob("run_*/stale.log"))
    assert rotated and rotated[0].read_text() == "old logs"


def test_from_pretrained_roundtrip(tmp_path):
    """Archive -> register -> from_pretrained by name and by path (reference
    core/classes/common.py:568-650 + utils/cloud.py cache)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mridc_tpu.models import (
        PretrainedModelInfo,
        build_model,
        from_pretrained,
        get_available_model_names,
        register_pretrained_model,
    )
    from mridc_tpu.train.checkpoints import save_archive

    cfg = {"model_name": "UNet", "channels": 4, "pooling_layers": 2,
           "fft_centered": True, "fft_normalization": "ortho"}
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 2)).astype(np.float32))
    sens = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 2)).astype(np.float32))
    mask = jnp.asarray(np.ones((1, 1, 16, 16), np.float32))
    params = model.init(jax.random.PRNGKey(0), y, sens, mask)["params"]
    archive = tmp_path / "unet_test.mridc"
    save_archive(archive, cfg, params)

    register_pretrained_model(PretrainedModelInfo(
        pretrained_model_name="unet_test",
        description="test archive",
        location=str(archive),
        aliases=("unet-alias",),
    ))
    assert "unet_test" in get_available_model_names()

    for key in ("unet_test", "unet-alias", str(archive)):
        m2, p2, cfg2 = from_pretrained(key)
        out1 = model.apply({"params": params}, y, sens, mask).prediction
        out2 = m2.apply({"params": p2}, y, sens, mask).prediction
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        from_pretrained("nonexistent-model")


def test_auto_dc_mode_gating():
    from mridc_tpu.launch import _auto_dc_mode

    base = {
        "model_name": "CIRIM",
        "train_ds": {"data_path": "/x", "mask_args": {"type": "equispaced1d"}},
    }
    assert _auto_dc_mode(dict(base))["dc_mode"] == "psf1d"
    # explicit setting wins
    assert _auto_dc_mode({**base, "dc_mode": "full"})["dc_mode"] == "full"
    # 2D mask types stay on the full path
    cfg2d = {**base, "train_ds": {"data_path": "/x", "mask_args": {"type": "poisson2d"}}}
    assert "dc_mode" not in _auto_dc_mode(cfg2d)
    # SSDU split masks are 2D point subsets
    assert "dc_mode" not in _auto_dc_mode({**base, "ssdu": True})
    # external mask files are unknown; half-scan zeroes rows
    assert "dc_mode" not in _auto_dc_mode(
        {**base, "train_ds": {**base["train_ds"], "mask_path": "/m"}}
    )
    assert "dc_mode" not in _auto_dc_mode(
        {**base, "train_ds": {**base["train_ds"], "half_scan_percentage": 0.1}}
    )
    # non-RIM models don't take dc_mode
    assert "dc_mode" not in _auto_dc_mode({**base, "model_name": "VN"})


def test_pretrained_checkpoint_loaded_for_test_mode(tmp_path, data_dir):
    """`pretrained: true` + `checkpoint: <.mridc>` loads the archived weights
    before evaluation (reference launch.py:129-132); previously run configs'
    checkpoint key was ignored and test mode evaluated random weights."""
    import flax.serialization as ser
    import jax

    from mridc_tpu.launch import run_from_config
    from mridc_tpu.models import build_model
    from mridc_tpu.train.checkpoints import save_archive

    model_cfg = {
        "model_name": "UNet",
        "channels": 4,
        "pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
        "test_ds": {"data_path": str(data_dir), "batch_size": 2,
                    "mask_args": {"type": "equispaced1d", "accelerations": [4], "center_fractions": [0.08]}},
    }
    model = build_model(model_cfg)
    rng = np.random.default_rng(0)
    y = np.stack([rng.standard_normal((1, 4, 32, 32)), rng.standard_normal((1, 4, 32, 32))], -1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(7), y, y, np.ones((1, 1, 32, 32), np.float32))
    archive = tmp_path / "unet.mridc"
    save_archive(archive, {k: v for k, v in model_cfg.items() if k != "test_ds"}, variables["params"])

    cfg = {
        "mode": "test",
        "pretrained": True,
        "checkpoint": str(archive),
        "model": model_cfg,
        "trainer": {"max_epochs": 1},
        "exp_manager": {"exp_dir": str(tmp_path / "exp"), "name": "pt"},
    }
    trainer, means = run_from_config(cfg)
    want = jax.tree_util.tree_leaves(ser.to_state_dict(variables["params"]))
    got = jax.tree_util.tree_leaves(ser.to_state_dict(trainer.state.params))
    assert all(np.allclose(a, b) for a, b in zip(got, want))
    assert np.isfinite(list(means.values())).all() if means else True
