"""Framework exceptions.

Parity: reference ``mridc/utils/exceptions.py`` (``MRIDCBaseException``,
``LightningNotInstalledException`` — the latter has no meaning here; the
equivalent environment failure is a missing JAX backend).
"""

from __future__ import annotations

__all__ = ["MRIDCBaseException", "CheckpointCompatibilityError"]


class MRIDCBaseException(Exception):
    """Base class for every exception raised by mridc_tpu."""


class CheckpointCompatibilityError(MRIDCBaseException):
    """Raised when a checkpoint/archive cannot be restored into the current
    model (shape mismatch, missing keys, incompatible config)."""
