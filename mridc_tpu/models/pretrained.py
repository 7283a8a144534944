"""Pretrained-model flow: PretrainedModelInfo registry + from_pretrained.

Functional parity with reference: mridc/core/classes/common.py:568-650
(``PretrainedModelInfo``, ``list_available_models``,
``get_available_model_names``, ``from_pretrained`` + the cloud download at
mridc/utils/cloud.py:15). Local paths and URLs both resolve to a ``.mridc``
archive restored through the registry; remote archives are cached sha-keyed
under the user cache dir.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

from mridc_tpu.train.checkpoints import restore_model
from mridc_tpu.utils.cloud import maybe_download_from_cloud
from mridc_tpu.utils.logging import get_logger

logger = get_logger()

__all__ = [
    "PretrainedModelInfo",
    "register_pretrained_model",
    "list_available_models",
    "get_available_model_names",
    "from_pretrained",
]


@dataclass(frozen=True)
class PretrainedModelInfo:
    pretrained_model_name: str
    description: str
    location: str  # URL or local path of a .mridc archive
    aliases: Optional[tuple] = None

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(\n"
            f"\tpretrained_model_name={self.pretrained_model_name},\n"
            f"\tdescription={self.description},\n"
            f"\tlocation={self.location}\n)"
        )


_PRETRAINED: Dict[str, PretrainedModelInfo] = {}


def register_pretrained_model(info: PretrainedModelInfo) -> PretrainedModelInfo:
    """First registration wins on collision, matching the reference's
    'whatever is listed first is instantiated' semantics."""
    for name in (info.pretrained_model_name, *(info.aliases or ())):
        _PRETRAINED.setdefault(name, info)
    return info


def list_available_models() -> List[PretrainedModelInfo]:
    seen, out = set(), []
    for info in _PRETRAINED.values():
        if id(info) not in seen:
            seen.add(id(info))
            out.append(info)
    return out


def get_available_model_names() -> List[str]:
    return [m.pretrained_model_name for m in list_available_models()]


def _resolve_location(model_name_or_path: str, refresh_cache: bool = False) -> Path:
    location = model_name_or_path
    if model_name_or_path in _PRETRAINED:
        location = _PRETRAINED[model_name_or_path].location
    if str(location).startswith(("http://", "https://")):
        filename = str(location).rsplit("/", 1)[-1]
        location = maybe_download_from_cloud(str(location), filename, refresh_cache=refresh_cache)
    path = Path(location)
    if not path.exists():
        raise FileNotFoundError(
            f"{model_name_or_path!r} is neither a registered pretrained model "
            f"({get_available_model_names() or 'none registered'}), a URL, nor an existing archive path"
        )
    return path


def from_pretrained(
    model_name_or_path: str,
    refresh_cache: bool = False,
    override_config: Optional[Dict] = None,
):
    """Build a (model, params, cfg) triple from a registered pretrained name,
    a URL, or a local ``.mridc`` archive path."""
    path = _resolve_location(model_name_or_path, refresh_cache)
    logger.info(f"Restoring pretrained model from {path}")
    return restore_model(path, override_config=override_config)


def from_pretrained_variables(
    model_name_or_path: str,
    refresh_cache: bool = False,
    override_config: Optional[Dict] = None,
):
    """Like :func:`from_pretrained` but returns ``(model, variables, cfg)``
    with the full variables dict — live-BN archives (train_batch_stats) carry
    a ``batch_stats`` collection alongside params."""
    from mridc_tpu.train.checkpoints import restore_model_variables

    path = _resolve_location(model_name_or_path, refresh_cache)
    logger.info(f"Restoring pretrained model from {path}")
    return restore_model_variables(path, override_config=override_config)
