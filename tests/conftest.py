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
