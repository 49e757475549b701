#!/usr/bin/env python
"""Headline benchmark: jacobi-3d 512^3 single sweep on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric (defensible on any silicon): analytic % of the single-sweep
HBM roofline — planned HBM bytes per cell-update (exact by construction:
the planner counts every DMA'd block incl. halo re-reads) vs the 8 B/cell
ideal (one f32 read + one f32 write).  BASELINE.md's reference number is
80% of roofline (82 GCell/s on a 819 GB/s v5e), so vs_baseline is the
roofline-fraction ratio and is hardware-independent.

Secondary fields:
  - xla_bytes_per_cell: independent cross-check from XLA's compiled cost
    model (bytes in/out of the whole jitted program).  It counts whole-array
    traffic but not intra-kernel halo re-reads, so it must sit slightly
    BELOW the analytic number; a hidden full-array pad/copy would push it
    ABOVE.  cross_check_ok asserts analytic >= xla and (analytic-xla) small.
  - wallclock_gcells_per_s: measured wall-clock throughput.  UNRELIABLE on
    timing-emulated devices (BASELINE.md measured 13-43 TiB/s effective HBM
    on this chip vs the 819 GB/s spec) — labeled, never the headline.

The Pallas build failing is a FAILURE (exit 1), not a silent fallback to
the XLA backend: a regression in the flagship kernel must show up red.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

BASELINE_ROOFLINE_PCT = 80.0  # BASELINE.md: 82 GCell/s = 80% of v5e roofline
BASELINE_GCELLS = 82.0
N = 512
REPS = 10


def _headline_fields() -> dict:
    """The analytic headline (exact planner byte counts) — ONE definition
    shared by the hardware path and the outage fallback so the two can
    never drift apart under the same metric name.  Needs no hardware."""
    from soda_tpu.frontend.parser import parse_file
    from soda_tpu.plan import planner as planner_mod
    from soda_tpu.utils import config as _cfg
    from soda_tpu.utils import report as report_mod

    here = pathlib.Path(__file__).resolve().parent
    program = parse_file(here / "tests" / "soda" / "jacobi3d.soda")
    rep = report_mod.analyze(
        planner_mod.plan(program, (N, N, N), sweeps=1), program=program)
    roofline_pct = 100.0 * rep.roofline_fraction
    # headline runs the DEFAULT engine (ep since the r3 hardware gate:
    # emit_pipeline's copy-in elides the flush-step re-fetch — exactly one
    # read per cell); the mosaic auto-pipeline number is kept as a
    # secondary so the opt-out path's traffic stays visible
    _cfg.set_lb_engine("mosaic")
    try:
        mosaic_rep = report_mod.analyze(
            planner_mod.plan(program, (N, N, N), sweeps=1), program=program)
    finally:
        _cfg.set_lb_engine(None)
    return {
        "metric": "jacobi3d_512cubed_single_sweep_roofline",
        "value": round(roofline_pct, 1),
        "unit": "% of single-sweep HBM roofline (analytic, 8 B/cell ideal)",
        "vs_baseline": round(roofline_pct / BASELINE_ROOFLINE_PCT, 3),
        "analytic_bytes_per_cell": round(rep.bytes_per_cell_update, 3),
        "lb_engine": _cfg.lb_engine(),
        "lb_engine_mosaic_roofline_pct": round(
            100.0 * mosaic_rep.roofline_fraction, 1),
        "_rep": rep,  # stripped before printing; used by the hw path
    }


def _analytic_only() -> int:
    """Hardware unavailable: emit the analytic headline with the outage
    labeled.  Exit 0 — an infra outage is not a code regression — but
    pallas_compile_checked: false records that the flagship build gate
    did NOT run (bench.py's contract: a kernel regression shows up red
    whenever hardware is reachable)."""
    fields = _headline_fields()
    fields.pop("_rep")
    fields.update({
        "pallas_compile_checked": False,
        "hardware": "UNAVAILABLE: JAX backend init hung/failed (axon "
                    "tunnel outage) — compile check, XLA cross-check and "
                    "wall-clock skipped; analytic numbers are exact plan "
                    "byte counts and unaffected",
    })
    print(json.dumps(fields))
    return 0


def main() -> int:
    from soda_tpu.utils.backend_probe import probe_default_backend

    if probe_default_backend() == "unavailable":
        return _analytic_only()
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
    from soda_tpu.plan import planner as planner_mod
    from soda_tpu.utils import report as report_mod

    here = pathlib.Path(__file__).resolve().parent
    program = parse_file(here / "tests" / "soda" / "jacobi3d.soda")
    grid_shape = (N, N, N)
    platform = jax.devices()[0].platform
    interpret = platform not in ("tpu",)

    # --- analytic headline: planner byte counts vs roofline (shared
    # definition with the outage fallback — see _headline_fields) ---
    headline = _headline_fields()
    rep = headline.pop("_rep")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(grid_shape).astype(np.float32))
    ins = {"t0": x}

    # --- flagship Pallas kernel: build/compile failure is a bench failure ---
    try:
        fn = jax.jit(pallas_backend.build_fn(
            program, grid_shape=grid_shape, interpret=interpret, iterate=1))
        t_c0 = time.perf_counter()
        lowered = fn.lower(ins, {})
        compiled = lowered.compile()
        compile_seconds = time.perf_counter() - t_c0
        out = compiled(ins, {})
        jax.block_until_ready(out)
    except Exception as e:  # loud: a flagship-kernel regression must be red
        print(json.dumps({
            "metric": "jacobi3d_512cubed_pallas_build",
            "value": 0.0,
            "unit": "FAILED: " + type(e).__name__,
            "vs_baseline": 0.0,
            "error": str(e)[:500],
        }))
        return 1

    # --- independent cross-check: XLA cost-model bytes for the whole
    # jitted program (catches hidden pad/copy traffic the planner does not
    # plan; excludes intra-kernel halo re-reads the planner does count) ---
    xla_bpc = report_mod.xla_bytes_per_update(compiled, N ** 3)
    cross_check_ok = None
    if xla_bpc is not None:
        # analytic must bound xla from above, and by <5% for the headline
        cross_check_ok = bool(
            rep.bytes_per_cell_update >= xla_bpc - 1e-6
            and rep.bytes_per_cell_update <= xla_bpc * 1.05)

    # --- wall-clock (labeled unreliable on timing-emulated devices) ---
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = compiled(ins, {})
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    gcells = (N ** 3) / dt / 1e9

    # secondary analytic rooflines (exact plan byte counts, no hardware):
    # the temporally-fused and wide-pair headline configs of this round
    def _pct(name, shape, **kw):
        pp = parse_file(here / "tests" / "soda" / f"{name}.soda")
        rr = report_mod.analyze(planner_mod.plan(pp, shape, **kw),
                                program=pp)
        return round(100.0 * rr.roofline_fraction, 1)

    secondary = {
        "jacobi2d_it8_2048_vs_8sweep_ideal_pct": _pct("jacobi2d",
                                                      (2048, 2048)),
        "accum64_2048_wide_roofline_pct": _pct("accum64", (2048, 2048)),
        "poisson3d_f64_256_wide_roofline_pct": _pct("poisson3d_f64",
                                                    (256, 256, 256)),
    }

    # oversize-grid path: jacobi3d at 2048^3 (32 GiB of arrays — beyond
    # one chip's HBM) through auto host tiles + auto pass cadence;
    # effective roofline = per-tile fraction ÷ halo-recompute
    # amplification (parallel/host_tile.py, the reference host's loop)
    from soda_tpu.parallel.host_tile import (choose_sweeps_per_pass,
                                             plan_host_tiling)
    pp = parse_file(here / "tests" / "soda" / "jacobi3d.soda")
    ht_shape = (2048, 2048, 2048)
    ht_nf, ht_tiles = choose_sweeps_per_pass(pp, ht_shape, tiles=None,
                                             hbm_budget=12 * 2**30)
    _, _, ht_ext, _, _, _, ht_amp = plan_host_tiling(
        pp, ht_shape, ht_tiles, ht_nf)
    ht_rep = report_mod.analyze(planner_mod.plan(pp, ht_ext), program=pp)
    secondary["jacobi3d_2048cubed_host_tiled_eff_roofline_pct"] = round(
        100.0 * ht_rep.roofline_fraction / ht_amp, 1)

    print(json.dumps({
        **headline,
        "pallas_compile_checked": True,
        "xla_bytes_per_cell": (None if xla_bpc is None else round(xla_bpc, 3)),
        "cross_check_ok": cross_check_ok,
        "est_gcells_per_s_v5e": round(rep.est_gcells_per_s_v5e, 1),
        # BASELINE.json 'compile wall-clock' metric: seconds (cached runs
        # hit the persistent compilation cache; the reference's Vivado
        # HLS+P&R flow is hours)
        "compile_seconds": round(compile_seconds, 2),
        **secondary,
        "wallclock_gcells_per_s": round(gcells, 2),
        "wallclock_vs_baseline_82": round(gcells / BASELINE_GCELLS, 3),
        "wallclock_note": "unreliable on timing-emulated devices (BASELINE.md)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
