"""The unselfsupervised experiment suite (projects/unselfsupervised/conf,
mirroring /root/reference/projects/unselfsupervised/*.yaml): every shipped
config validates against the schema, and the SSDU + N2R train configs run
end-to-end through ``mridc_tpu.launch`` on the synthetic fixture."""

import pytest

pytestmark = pytest.mark.slow

from pathlib import Path

import numpy as np
import pytest

from fixtures import create_dataset
from mridc_tpu.train.config import load_config
from mridc_tpu.train.schemas import validate_config

CONF = Path(__file__).resolve().parent.parent / "projects" / "unselfsupervised" / "conf"
ALL_PROJECT_CONF = sorted((CONF.parent.parent).glob("*/conf/*.yaml"))


def test_suite_is_shipped():
    names = {p.name for p in CONF.glob("*.yaml")}
    # the reference's 17-file suite (ssdu/n2r/fullunsup train+test, supervised
    # baselines, classical baselines, zf/target)
    for required in (
        "base_ssdu_train.yaml",
        "base_ssdu_test.yaml",
        "base_n2r_train.yaml",
        "base_n2r_test.yaml",
        "base_n2r_fullunsup_train.yaml",
        "base_n2r_fullunsup_test.yaml",
        "base_resnet_train.yaml",
        "base_unet_train.yaml",
        "base_cirim_train.yaml",
        "base_cs_run.yaml",
        "base_pics_run.yaml",
        "base_pg_run.yaml",
        "base_zf_run.yaml",
        "base_target_run.yaml",
    ):
        assert required in names, f"missing {required}"
    assert len(names) >= 17


@pytest.mark.parametrize("cfg_path", ALL_PROJECT_CONF, ids=lambda p: f"{p.parent.parent.name}/{p.name}")
def test_every_project_config_validates(cfg_path):
    cfg = load_config(cfg_path)
    validate_config(cfg)
    from mridc_tpu.models import build_model

    build_model(cfg["model"])


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("unselfsup_data")
    create_dataset(root, n_files=1, slices=2, coils=4, h=32, w=32)
    return root


def _launch(name, tmp_path, data_dir, extra=()):
    from mridc_tpu.launch import run_from_config

    overrides = [
        f"model.train_ds.data_path={data_dir}",
        "model.train_ds.dataset_format=null",
        "model.train_ds.batch_size=2",
        "model.validation_ds.data_path=null",
        f"exp_manager.exp_dir={tmp_path / 'exp'}",
        "trainer.max_epochs=1",
        "trainer.max_steps=2",
        *extra,
    ]
    cfg = load_config(CONF / name, overrides)
    validate_config(cfg)
    return run_from_config(cfg)


def test_ssdu_train_e2e(tmp_path, data_dir):
    """base_ssdu_train through the launcher: SSDU split masks + k-space loss."""
    _, history = _launch(
        "base_ssdu_train.yaml",
        tmp_path,
        data_dir,
        extra=[
            "pretrained=false",  # the reference config warm-starts; fixture run trains from scratch
            "model.unrolled_iterations=2",
            "model.residual_blocks=1",
            "model.channels=8",
        ],
    )
    assert np.isfinite(history[-1]["train_loss"])


def test_n2r_train_e2e(tmp_path, data_dir):
    """base_n2r_train through the launcher: N2R consistency + supervised subset."""
    _, history = _launch(
        "base_n2r_train.yaml",
        tmp_path,
        data_dir,
        extra=["model.channels=4", "model.pooling_layers=2"],
    )
    assert np.isfinite(history[-1]["train_loss"])
