"""Test configuration.

Tests run on CPU with 8 fake devices so the multi-chip sharding paths
(mesh + pjit + collective top-k merge) execute without TPU hardware —
the strategy SURVEY.md §4.3 prescribes.  Benchmarks (bench.py) run on
the real chip instead.
"""

import os

# XLA_FLAGS is read at backend initialization (lazily, on first
# computation), so setting it here is early enough even though the
# environment pre-imports jax at interpreter startup.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported (site hook); config.update still wins as
# long as no backend has initialized yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_INDEX = "/root/reference/mcp/piers_morgan_faiss_index.faiss"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def bundled_index_path():
    if not os.path.exists(REFERENCE_INDEX):
        pytest.skip("bundled reference index not available")
    return REFERENCE_INDEX
