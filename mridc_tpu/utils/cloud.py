"""Cached download of pretrained model archives.

Functional parity with reference: mridc/utils/cloud.py:15
``maybe_download_from_cloud`` — sha-keyed cache subfolder under the user cache
dir, skip when present (urllib instead of wget).
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
from pathlib import Path
from typing import Optional

from mridc_tpu.utils.logging import get_logger

logger = get_logger()

__all__ = ["maybe_download_from_cloud", "resolve_cache_dir"]


def resolve_cache_dir() -> Path:
    override = os.environ.get("MRIDC_TPU_CACHE_DIR")
    if override:
        return Path(override)
    return Path.home() / ".cache" / "mridc_tpu"


def maybe_download_from_cloud(url: str, filename: str, subfolder: Optional[str] = None, refresh_cache: bool = False) -> Path:
    key = hashlib.sha256((url + filename).encode()).hexdigest()[:16]
    # the url sha is ALWAYS part of the cache path: two different urls sharing
    # subfolder+filename must not alias to the same cached file
    dest_dir = resolve_cache_dir() / subfolder / key if subfolder else resolve_cache_dir() / key
    dest = dest_dir / filename
    if dest.exists() and not refresh_cache:
        return dest
    dest_dir.mkdir(parents=True, exist_ok=True)
    full = url.rstrip("/") + "/" + filename if not url.endswith(filename) else url
    logger.info(f"Downloading {full} -> {dest}")
    # download to a temp name and rename atomically: an interrupted download
    # must not leave a partial file that later calls treat as a cache hit
    tmp = dest.with_suffix(dest.suffix + ".part")
    try:
        urllib.request.urlretrieve(full, tmp)  # noqa: S310
        os.replace(tmp, dest)
    finally:
        if tmp.exists():
            tmp.unlink()
    return dest
