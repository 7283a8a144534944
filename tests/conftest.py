"""Test configuration: force an 8-virtual-device CPU platform before JAX init.

Mirrors the reference's CPU-only test strategy (reference: tests run everything
on CPU, SURVEY.md §4) but adds real multi-device coverage via
``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A site hook pre-imports jax at interpreter startup, so the env vars above can
# be too late for config defaults — force the platform explicitly as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
