"""Structured config schema validation (train/schemas.py).

Reference parity: the hydra ConfigStore dataclasses in
mridc/core/conf/{trainer,optimizers,schedulers}.py reject unknown/mistyped
keys at compose time; validate_config does the same over the YAML dicts.
"""

import glob

import pytest
import yaml

from mridc_tpu.train.config import load_config
from mridc_tpu.train.schemas import ConfigValidationError, validate_config


def test_every_project_yaml_validates():
    paths = sorted(glob.glob("projects/**/*.yaml", recursive=True))
    assert paths, "project config zoo missing"
    for p in paths:
        cfg = load_config(p)
        assert validate_config(cfg) == [], p


def test_unknown_trainer_key_suggests():
    cfg = {"trainer": {"max_epoch": 3}}
    with pytest.raises(ConfigValidationError, match="max_epochs"):
        validate_config(cfg)


def test_wrong_type_rejected():
    with pytest.raises(ConfigValidationError, match="gradient_clip_val"):
        validate_config({"trainer": {"gradient_clip_val": "big"}})
    # bool is not silently accepted where a number is expected
    with pytest.raises(ConfigValidationError, match="max_epochs"):
        validate_config({"trainer": {"max_epochs": True}})


def test_unknown_optimizer_and_scheduler_named():
    with pytest.raises(ConfigValidationError, match="adamw"):
        validate_config({"model": {"optim": {"name": "adamwz", "lr": 1e-3}}})
    with pytest.raises(ConfigValidationError, match="CosineAnnealing"):
        validate_config(
            {"model": {"optim": {"name": "adam", "lr": 1e-3, "sched": {"name": "CosineAnealing"}}}}
        )


def test_exp_manager_nested_blocks():
    bad = {
        "exp_manager": {
            "checkpoint_callback_params": {"save_topk": 3},
            "ema": {"decay": "fast"},
        }
    }
    problems = validate_config(bad, strict=False)
    assert any("save_top_k" in p for p in problems)
    assert any("ema.decay" in p for p in problems)


def test_non_strict_returns_list():
    assert validate_config({"trainer": {"max_epochs": 2}}, strict=False) == []


def test_sched_accepts_reference_params():
    cfg = {
        "model": {
            "optim": {
                "name": "novograd",
                "lr": 1e-3,
                "betas": [0.9, 0.98],
                "weight_decay": 0.001,
                "sched": {"name": "CosineAnnealing", "warmup_ratio": 0.1, "min_lr": 1e-8},
            }
        }
    }
    assert validate_config(cfg) == []
