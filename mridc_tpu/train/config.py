"""YAML config loading with dotlist overrides.

Plays the role of Hydra+OmegaConf in the reference
(reference: mridc/core/conf/hydra_runner.py:21-114) with plain PyYAML:
``load_config(path, overrides=["model.lr=1e-3", "mode=test"])`` — same
``model:/trainer:/exp_manager:/mode:`` layout as the reference YAMLs, and the
same ``key=value`` dotlist override syntax.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import yaml

__all__ = ["load_config", "merge_dicts", "apply_overrides", "parse_value", "save_config", "maybe_update_config_version"]


def merge_dicts(base: Dict, update: Dict) -> Dict:
    """Recursive dict merge (update wins)."""
    out = copy.deepcopy(base)
    for k, v in (update or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def parse_value(text: str) -> Any:
    """Parse an override value with YAML semantics ('1e-3' -> float, 'null' -> None)."""
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        # YAML 1.1 treats dot-less scientific notation ('1e-3') as a string
        try:
            return float(value)
        except ValueError:
            return value
    return value


def apply_overrides(cfg: Dict, overrides: Optional[Sequence[str]]) -> Dict:
    """Apply ``a.b.c=value`` dotlist overrides in place-ish (returns new dict)."""
    cfg = copy.deepcopy(cfg)
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"Override {item!r} is not of the form key=value")
        key, _, value = item.partition("=")
        node = cfg
        parts = key.strip().lstrip("+").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"Cannot override through non-dict key {p!r} in {key!r}")
        node[parts[-1]] = parse_value(value)
    return cfg


def maybe_update_config_version(cfg: Any) -> Any:
    """Recursively migrate legacy (Hydra 0.x-era) config layouts to the
    current schema: ``cls`` -> ``_target_``, and the contents of a nested
    ``params`` block are hoisted into the parent.

    Parity: reference ``mridc/utils/model_utils.py:437`` (``maybe_update_config_version``,
    via ``_convert_config`` :412) — same two rewrites, applied to plain dicts
    instead of OmegaConf nodes.
    """
    if not isinstance(cfg, dict):
        return cfg
    out = dict(cfg)
    if "cls" in out and "_target_" not in out:
        out["_target_"] = out.pop("cls")
    params = out.pop("params", None)
    if isinstance(params, dict):
        for k, v in params.items():
            out.setdefault(k, v)
    elif params is not None:
        out["params"] = params  # non-dict params: leave untouched
    return {k: maybe_update_config_version(v) if isinstance(v, dict) else v for k, v in out.items()}


def load_config(path: Union[str, Path], overrides: Optional[Sequence[str]] = None) -> Dict:
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f) or {}
    cfg = maybe_update_config_version(cfg)
    return apply_overrides(cfg, overrides)


def save_config(cfg: Dict, path: Union[str, Path]):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
