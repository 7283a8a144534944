"""Run-builder app: core config assembly + the HTTP surface.

Reference parity: mridc/app/run.py (task/model/mode selection, full config
editing, YAML export, run launch at :2799-2833) rebuilt data-driven over the
project config zoo + structured schemas.
"""

import json
import urllib.request

import pytest
import yaml

from mridc_tpu.app import core
from mridc_tpu.app.server import serve_in_thread
from mridc_tpu.train.schemas import ConfigValidationError


def test_list_tasks_and_models():
    tasks = core.list_tasks()
    assert set(tasks) >= {"reconstruction", "segmentation", "quantitative", "multitask"}
    models = {m["name"]: m for m in core.list_models("reconstruction")}
    assert "cirim" in models
    assert "train" in models["cirim"]["modes"]
    assert models["cirim"]["display"] == "CIRIM"


def test_load_defaults_and_flatten():
    cfg = core.load_defaults("reconstruction", "cirim", "train")
    assert cfg["mode"] == "train"
    fields = dict(core.flatten_config(cfg))
    assert fields["model.model_name"] == "CIRIM"
    assert "model.optim.lr" in fields


def test_build_config_overrides_and_validation():
    cfg = core.build_config(
        "reconstruction", "cirim", "train", {"model.optim.lr": 3e-4, "trainer.max_epochs": 2}
    )
    assert cfg["model"]["optim"]["lr"] == 3e-4
    assert cfg["trainer"]["max_epochs"] == 2
    with pytest.raises(ConfigValidationError, match="max_epochs"):
        core.build_config("reconstruction", "cirim", "train", {"trainer.max_epoch": 2})


def test_export_and_run_command(tmp_path):
    cfg = core.build_config("reconstruction", "cirim", "train", {})
    path = core.export_config(cfg, str(tmp_path))
    assert path.name == "cirim_train.yaml"
    reloaded = yaml.safe_load(open(path))
    assert reloaded["model"]["model_name"] == "CIRIM"
    cmd = core.run_command(str(path))
    assert cmd[-2:] == ["--config-name", "cirim_train.yaml"]


@pytest.fixture(scope="module")
def app_url():
    httpd, url = serve_in_thread()
    yield url
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"content-type": "application/json"}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_page_and_tasks(app_url):
    with urllib.request.urlopen(app_url + "/", timeout=30) as r:
        assert r.status == 200 and b"run builder" in r.read()
    status, tasks = _get(app_url + "/api/tasks")
    assert status == 200 and "reconstruction" in tasks


def test_http_config_fields(app_url):
    status, d = _get(app_url + "/api/models?task=reconstruction")
    assert status == 200 and any(m["name"] == "cirim" for m in d)
    status, d = _get(app_url + "/api/config?task=reconstruction&model=cirim&mode=train")
    assert status == 200
    keys = [k for k, _ in d["fields"]]
    assert "model.model_name" in keys and "model.optim.lr" in keys


def test_http_export_roundtrip(app_url, tmp_path):
    status, d = _post(
        app_url + "/api/export",
        {
            "task": "reconstruction",
            "model": "cirim",
            "mode": "train",
            "export_dir": str(tmp_path),
            "overrides": {"model.optim.lr": "3e-4", "trainer.max_epochs": "2"},
        },
    )
    assert status == 200, d
    cfg = yaml.safe_load(open(d["path"]))
    assert cfg["model"]["optim"]["lr"] == 3e-4
    assert cfg["trainer"]["max_epochs"] == 2
    assert "mridc_tpu.launch" in d["command"]


def test_http_export_rejects_typo(app_url, tmp_path):
    status, d = _post(
        app_url + "/api/export",
        {
            "task": "reconstruction",
            "model": "cirim",
            "mode": "train",
            "export_dir": str(tmp_path),
            "overrides": {"trainer.max_epoch": "2"},
        },
    )
    assert status == 400
    assert "max_epochs" in d["error"]
