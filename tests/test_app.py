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


def test_form_spec_groups_types_choices():
    """Schema-driven per-model forms (reference app/run.py:24-304 form depth):
    grouped sections, typed widgets, registry-backed choice lists, and the
    full optional schema surface beyond the YAML defaults."""
    from mridc_tpu.app.forms import form_spec

    spec = form_spec("reconstruction", "cirim", "train")
    groups = {g["prefix"]: g for g in spec["groups"]}
    assert "model" in groups and "trainer" in groups and "model.optim" in groups

    fields = {f["key"]: f for g in spec["groups"] for f in g["fields"]}
    # choice fields come from the live registries
    assert fields["model.optim.name"]["type"] == "choice"
    assert "adam" in fields["model.optim.name"]["choices"]
    assert fields["model.model_name"]["type"] == "choice"
    assert "CIRIM" in fields["model.model_name"]["choices"]
    sched = fields.get("model.optim.sched.name")
    if sched is not None:
        assert "cosineannealing" in [c.lower() for c in sched["choices"]]
    # mask type choices from the masker registry
    mask_keys = [k for k in fields if k.endswith("mask_args.type")]
    assert mask_keys and "poisson2d" in fields[mask_keys[0]]["choices"]
    # schema keys absent from the YAML appear as optional extras
    optional = [k for k, f in fields.items() if f["optional"]]
    assert any(k.startswith("trainer.") for k in optional)
    # typed from schema: a boolean trainer key renders as bool
    bools = [f for f in fields.values() if f["type"] == "bool"]
    assert bools


def test_http_form_endpoint(app_url):
    import json
    from urllib.request import urlopen

    with urlopen(f"{app_url}/api/form?task=reconstruction&model=cirim&mode=train") as r:
        spec = json.loads(r.read())
    assert spec["groups"]
    f0 = spec["groups"][0]["fields"][0]
    assert "text" in f0 and "type" in f0


def test_http_export_with_form_override(app_url, tmp_path):
    import json
    from urllib.request import urlopen, Request

    body = json.dumps({
        "task": "reconstruction", "model": "cirim", "mode": "train",
        "export_dir": str(tmp_path),
        "overrides": {"trainer.max_epochs": "3", "model.optim.name": "adamw"},
    }).encode()
    req = Request(f"{app_url}/api/export", data=body, headers={"content-type": "application/json"})
    with urlopen(req) as r:
        resp = json.loads(r.read())
    import yaml

    cfg = yaml.safe_load(open(resp["path"]))
    assert cfg["trainer"]["max_epochs"] == 3
    assert cfg["model"]["optim"]["name"] == "adamw"
