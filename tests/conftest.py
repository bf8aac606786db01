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

# XLA compile time dominates this suite; reuse compiled executables across
# sessions (same persistent cache bench.py uses, .jax_cache/ is gitignored).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full parity/e2e suite, ~11 min total)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test, deselected by default (enable with --runslow)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (use --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
