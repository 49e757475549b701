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
#   "mosaic" — pl.pallas_call's automatic pipeline (the hardware-proven
#       round-2/3 path).  Its BlockSpec machinery fetches one input block
#       per grid step, so the final flush step (which revisits the last
#       block index) re-reads one block per z/row pass: traffic is
#       (G+1)/G of ideal.
#   "ep" — explicit pltpu.emit_pipeline march.  Its copy-in is predicated
#       on the block index CHANGING between consecutive steps
#       (jax/_src/pallas/mosaic/pipeline.py: initialize_step's
#       `block_changed = _tuples_differ(...)` and _default_schedule's
#       `copy_in=... will_change_fetch`), so the final flush step fetches
#       nothing and the march reads each cell exactly once: G/G of ideal.
#       Output copy-out is likewise predicated on index change
#       (`copy_out=... will_change_current | last_step`), so the unwritten
#       step-0 buffer is never flushed.
_LB_ENGINE: str | None = None
_VALID = ("mosaic", "ep")


def lb_engine() -> str:
    if _LB_ENGINE is not None:
        return _LB_ENGINE
    v = os.environ.get("SODA_LB_ENGINE", "mosaic")
    return v if v in _VALID else "mosaic"


def set_lb_engine(v: str | None) -> None:
    """Override the engine (tests, CLI); None restores the env default."""
    global _LB_ENGINE
    if v is not None and v not in _VALID:
        raise ValueError(f"lb engine must be one of {_VALID}, got {v!r}")
    _LB_ENGINE = v


def lb_ep_eligible(hy: int, by: int) -> bool:
    """emit_pipeline BlockSpecs address in block-granular units, so the
    y-strip pieces (height hy at offsets j*by - hy) need hy | by; the
    untiled-y march (hy == 0) is always eligible."""
    return hy == 0 or by % hy == 0
