"""Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 item 3).

NOTE: this environment ships an `axon` TPU plugin that force-registers itself
via sitecustomize and overrides JAX_PLATFORMS at import time
(`jax.config.update("jax_platforms", "axon,cpu")`).  Setting the env var is NOT
enough; we must update the config back to cpu after jax import, before any
computation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
