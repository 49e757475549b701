"""Runtime engine switches shared by the planner and the backends.

Kept in utils so the planner (which models traffic) and the backend
(which emits kernels) read the SAME switch — a mismatch would only skew
the reported traffic numbers, never correctness, but the reports are
contractual (--report / bench.py), so both sides call lb_engine() at
plan/build time.
"""

from __future__ import annotations

import os

# Line-buffer march engine:
#   "ep" (DEFAULT since the r3 hardware gate went green) — explicit
#       pltpu.emit_pipeline march.  Its copy-in is predicated on the block
#       index CHANGING between consecutive steps
#       (jax/_src/pallas/mosaic/pipeline.py: initialize_step's
#       `block_changed = _tuples_differ(...)` and _default_schedule's
#       `copy_in=... will_change_fetch`), so the final flush step fetches
#       nothing and the march reads each cell exactly once: G/G of ideal.
#       Output copy-out is likewise predicated on index change
#       (`copy_out=... will_change_current | last_step`), so the unwritten
#       step-0 buffer is never flushed.  Hardware-validated at size by
#       scripts/tpu_check.py (every linebuffer config runs under BOTH
#       engines, oracle-checked; jacobi3d 512^3 = 8.000 B/cell exact).
#   "mosaic" — pl.pallas_call's automatic pipeline (the hardware-proven
#       round-2/3 path, kept as the opt-out).  Its BlockSpec machinery
#       fetches one input block per grid step, so the final flush step
#       (which revisits the last block index) re-reads one block per
#       z/row pass: traffic is (G+1)/G of ideal.
_LB_ENGINE: str | None = None
_VALID = ("mosaic", "ep")


def lb_engine() -> str:
    if _LB_ENGINE is not None:
        return _LB_ENGINE
    v = os.environ.get("SODA_LB_ENGINE", "ep")
    return v if v in _VALID else "ep"


def set_lb_engine(v: str | None) -> None:
    """Override the engine (tests, CLI); None restores the env default."""
    global _LB_ENGINE
    if v is not None and v not in _VALID:
        raise ValueError(f"lb engine must be one of {_VALID}, got {v!r}")
    _LB_ENGINE = v


def lb_ep_eligible(x: int, hy: int = 0, by: int = 1) -> bool:
    """Whether the emit_pipeline march can drive this line-buffer config.

    Two hardware-measured constraints (violations fall back to the mosaic
    auto-pipeline, whose Element windows handle both):

    - the lane (last) dim must be 128-aligned: emit_pipeline's block DMA
      lowers to tpu.memref_slice on the padded HBM memref, and Mosaic
      rejects "Slice shape along dimension N must be aligned to tiling
      (128)" for any x % 128 != 0 (measured on v5e: jacobi3d 500^3 /
      96x96x500 both fail; 100x100x512 with the rim clip passes) —
      independent of the aligned-core clip;
    - emit_pipeline BlockSpecs address in block-granular units, so the
      y-strip pieces (height hy at offsets j*by - hy) need hy | by; the
      untiled-y march (hy == 0) is always eligible."""
    return x % 128 == 0 and (hy == 0 or by % hy == 0)
