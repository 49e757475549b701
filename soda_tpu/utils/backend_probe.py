"""Timed out-of-process probe of the default JAX backend.

A dead axon tunnel makes jax.devices() hang FOREVER in-process — even
under JAX_PLATFORMS=cpu, because the axon register hook intercepts
get_backend (observed round 3).  Probing in a subprocess with a timeout
lets callers (bench.py, __graft_entry__, scripts/tpu_check.py) fail or
fall back loudly instead of sitting at zero CPU.  The in-process
jax_platforms=cpu override (tests/conftest.py style) still works during
an outage as long as it runs before the first backend init.
"""

from __future__ import annotations

import subprocess
import sys

PROBE_TIMEOUT_S = 240.0


def probe_default_backend(min_devices: int = 1,
                          timeout_s: float = PROBE_TIMEOUT_S) -> str:
    """Platform name of device 0 ("tpu", "cpu", ...) if the default
    backend initializes with >= min_devices devices within the timeout;
    "unavailable" otherwise (hang, crash, or too few devices)."""
    code = (f"import jax, sys; d = jax.devices(); "
            f"sys.exit(3) if len(d) < {int(min_devices)} else "
            f"print(d[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True, text=True)
        if r.returncode == 0:
            lines = r.stdout.strip().splitlines()
            if lines:
                return lines[-1]
    except (subprocess.TimeoutExpired, OSError):
        pass
    return "unavailable"


def force_cpu_backend(n_devices: int = 1) -> None:
    """In-process CPU override (the conftest.py pattern): clear any
    initialized backend FIRST (jax_num_cpu_devices refuses to update
    while one is live), then switch platform and device count."""
    import os

    import jax
    import jax.extend.backend as jexb

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    jexb.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
