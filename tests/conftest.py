"""Test configuration.

Forces JAX onto a simulated 8-device CPU mesh so sharding/collective tests
run without TPU hardware.  IMPORTANT (verified quirk): the shell profile
exports JAX_PLATFORMS=axon which overrides env-prefix assignment, so the
platform must be forced in-process BEFORE the first jax import.

Real-TPU validation is done separately (scripts/tpu_check.py, bench.py),
which use the default platform.
"""

import os
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite jits thousands of kernels in one process; without
    eviction the executable caches grow to ~100 GB by the tail modules
    and the box starts thrashing (observed round 5 on the 1-CPU/125 GB
    host: a wide-fuzz test that takes seconds in isolation sat for an
    hour at 99% memory).  Per-module clearing bounds the growth; the
    few cross-module recompiles are noise next to that."""
    yield
    jax.clear_caches()
