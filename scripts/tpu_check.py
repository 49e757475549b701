#!/usr/bin/env python
"""Validate the compiled Pallas backend on real TPU hardware.

Runs every corpus program through the compiled (non-interpret) Pallas path
on the attached TPU and checks against the NumPy oracle.  The CPU CI suite
(tests/) covers the same path in interpret mode; this script is the
hardware truth.  Run with the default (axon) platform:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_check.py

NOTE: do not override PYTHONPATH wholesale — the axon PJRT plugin registers
via sitecustomize in $PYTHONPATH (/root/.axon_site); dropping it makes the
'axon' backend unknown.
"""

import argparse
import glob
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from soda_tpu.frontend.parser import parse_file
from soda_tpu.interp import numpy_interp
from soda_tpu.backend import pallas as pallas_backend

SODA = pathlib.Path(__file__).resolve().parents[1] / "tests" / "soda"
SHAPES = {1: (2048,), 2: (48, 128), 3: (24, 32, 128)}

# At-size gate (VERDICT r2 #3): tiny-shape runs select different strategies
# than production sizes (windows vs linebuffer-at-scale, hybrid rim,
# trapezoid depth), so one oracle-checked PRODUCTION-size config per
# strategy runs here too — the sizes the benchmark table advertises.
# (program, shape, iterate override, forced sweeps, expected strategy)
AT_SIZE = [
    ("jacobi3d", (512, 512, 512), None, None, "linebuffer"),  # 3-D z-march
    ("jacobi3d", (1024, 1024, 1024), None, None, "linebuffer"),  # 4 GiB arrays
    ("jacobi3d", (500, 500, 500), None, None, "linebuffer"),  # core + rim
    ("jacobi2d", (2048, 2048), None, None, "strips"),     # trapezoid it=8
    ("accum64", (2048, 2048), None, None, "linebuffer"),  # wide pair LB
    ("poisson_f64", (2048, 2048), None, None, "linebuffer"),  # DS-f64 LB
    ("jacobi2d_i64", (2048, 2048), None, 20, "strips"),   # wide fori x20
    ("poisson3d_f64", (256, 256, 256), None, None, "linebuffer"),  # 3-D pair LB
    ("blur", (2048, 4096), None, None, "linebuffer"),     # 2-D row-march
    ("heat3d", (256, 256, 256), None, None, "strips"),    # fused-sweep 3-D
]


# one definition of the input distributions and comparison gates,
# shared with the CPU suite (review r5: they had started to diverge —
# the f32-libm 2e-3 gate existed only here)
from soda_tpu.utils.testing import compare_outputs as _compare_impl
from soda_tpu.utils.testing import rand_inputs as _rand_inputs


def _compare(p, got, gold, rim):
    return _compare_impl(p, got, gold, rim)


def run_at_size(rng) -> int:
    """One oracle-checked production-size config per kernel strategy.

    Linebuffer configs run under BOTH march engines (mosaic auto-pipeline
    and the emit_pipeline one-read-per-cell engine — utils/config.py),
    sharing one oracle evaluation per config; the at-size gate is where a
    Mosaic-compile regression in either engine would surface."""
    from soda_tpu.plan.planner import plan as make_plan
    from soda_tpu.utils import config

    failures = 0
    for name, shape, it, sweeps, want_strategy in AT_SIZE:
        p = parse_file(SODA / f"{name}.soda",
                       overrides={"iterate": it} if it else None)
        label = f"{name} {'x'.join(map(str, shape))}"
        ins, ps = _rand_inputs(p, shape, rng)
        gold = numpy_interp.run(p, ins, ps)
        engines = (["mosaic", "ep"] if want_strategy == "linebuffer"
                   else ["mosaic"])
        for eng in engines:
            config.set_lb_engine(eng)
            try:
                pl = make_plan(p, shape, sweeps=sweeps)
                strat = pl.groups[0].strategy
                if strat != want_strategy:
                    print(f"{label} [{eng}]: STRATEGY {strat} "
                          f"(expected {want_strategy})")
                    failures += 1
                got = pallas_backend.run(p, ins, ps, the_plan=pl)
            except Exception as e:  # noqa: BLE001
                print(f"{label} [{eng}]: COMPILE/RUN FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")
                failures += 1
                continue
            finally:
                config.set_lb_engine(None)
            ok = _compare(p, got, gold, p.valid_rim())
            nf = pl.groups[0].sweeps
            bpc = (pl.groups[0].hbm_bytes_per_call
                   / max(pl.groups[0].useful_cells_per_call, 1))
            print(f"{label} [{strat}/{eng}, sweeps={nf}, "
                  f"{bpc:.3f}B/c]: {'OK' if ok else 'MISMATCH'}")
            failures += 0 if ok else 1
    return failures


def run_host_tile_gate(rng) -> int:
    """Host-side sequential tiling (parallel/host_tile.py — the
    single-chip oversize-grid path) at production size on hardware:
    overlapping tiles through the compiled Pallas path, stitched on the
    host, oracle-checked.  Tiles are chosen so the halo machinery and
    tile seams are genuinely exercised (grid split both ways)."""
    from soda_tpu.parallel.host_tile import run_host_tiled

    cases = [
        ("jacobi3d", (512, 512, 512), (256, 256, 512), None),
        ("jacobi2d", (2048, 2048), (1024, 1024), None),   # trapezoid tiles
        ("accum64", (1024, 2048), (512, 1024), None),     # wide pair tiles
        ("jacobi2d", (2048, 2048), "auto", "auto"),       # joint auto chooser
    ]
    failures = 0
    for name, shape, tiles, spp in cases:
        p = parse_file(SODA / f"{name}.soda")
        if tiles == "auto":
            # joint auto tiles + pass cadence under a budget tight
            # enough (32 MiB) to force genuine tiling at this size
            from soda_tpu.parallel.host_tile import choose_sweeps_per_pass
            spp, tiles = choose_sweeps_per_pass(
                p, shape, tiles=None, hbm_budget=32 * 2**20)
        label = f"{name} {'x'.join(map(str, shape))} host-tiled " \
                f"{'x'.join(map(str, tiles))}"
        ins, ps = _rand_inputs(p, shape, rng)
        gold = numpy_interp.run(p, ins, ps)
        try:
            got = run_host_tiled(p, ins, ps, tiles=tiles,
                                 sweeps_per_pass=spp)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            failures += 1
            continue
        ok = _compare(p, got, gold, p.valid_rim())
        print(f"{label}: {'OK' if ok else 'MISMATCH'}")
        failures += 0 if ok else 1
    return failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-only", action="store_true",
                    help="skip the production-size strategy gate")
    args = ap.parse_args()

    # preflight the backend in a TIMED subprocess: a dead axon tunnel
    # makes jax.devices() hang forever in-process (observed round 3);
    # fail loudly instead of sitting at zero CPU
    from soda_tpu.utils.backend_probe import probe_default_backend

    if probe_default_backend() == "unavailable":
        print("FATAL: JAX backend init hung/failed (axon tunnel outage?) "
              "— hardware gate cannot run; retry when the tunnel recovers")
        return 2

    import jax

    # persistent compile cache: the at-size kernels take 20-60 s each to
    # Mosaic-compile cold; repeats are seconds
    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rng = np.random.default_rng(7)
    failures = 0
    for f in sorted(glob.glob(str(SODA / "*.soda"))):
        p = parse_file(f)
        ins, ps = _rand_inputs(p, SHAPES[p.rank], rng)
        gold = numpy_interp.run(p, ins, ps)
        # oracle chain: TPU output must also match the NATIVE C++ golden
        # runner (which is bit-exact vs the NumPy oracle — enforced here)
        import shutil
        if shutil.which("g++"):
            from soda_tpu.backend import cpp as cpp_backend

            cgold = cpp_backend.compile_and_run(p, ins, ps)
            for k in gold:
                if p.uses_libm_transcendentals():
                    # exp/log/trig: libm vs numpy differ by ~1 ulp — at
                    # the ulp scale of the program's widest float
                    rt = {64: 1e-13, 32: 2e-5,
                          16: 2e-2}[p.max_float_width()]
                    ok_c = np.allclose(
                        np.asarray(cgold[k], np.float64),
                        np.asarray(gold[k], np.float64),
                        rtol=rt, atol=rt)
                else:
                    ok_c = np.array_equal(cgold[k], gold[k])
                if not ok_c:
                    print(f"{pathlib.Path(f).stem}: C++/NumPy oracle mismatch!")
                    failures += 1
        from soda_tpu.interp import wide128

        w128 = wide128.program_is_128(p)
        try:
            if w128:
                # >64-bit: the documented native route is the XLA backend
                # (quad-limb V carriers jitted onto the TPU); the Pallas
                # path's typed rejection is pinned by tests/test_backends
                from soda_tpu.backend import xla as xla_backend

                got = xla_backend.run(p, ins, ps)
            else:
                got = pallas_backend.run(p, ins, ps, vmem_budget=4 * 2**20)
        except Exception as e:  # noqa: BLE001
            print(f"{pathlib.Path(f).stem}: COMPILE/RUN FAILED: {type(e).__name__}")
            failures += 1
            continue
        ok = _compare(p, got, gold, p.valid_rim())
        tag = " [xla quad-limb]" if w128 else ""
        print(f"{pathlib.Path(f).stem}{tag}: {'OK' if ok else 'MISMATCH'}")
        failures += 0 if ok else 1

    if not args.small_only:
        print("--- at-size strategy gate (production shapes) ---")
        failures += run_at_size(rng)
        print("--- host-tiling gate (oversize-grid path) ---")
        failures += run_host_tile_gate(rng)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
