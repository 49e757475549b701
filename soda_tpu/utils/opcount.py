"""Analytic per-cell operation counts from the IR — the compute half of
the roofline (the reference's analog is HLS resource/II reports,
SURVEY.md §5 'tracing' row).

Counts VPU ops per output cell for each stage: arithmetic/select/compare
as 1 op, transcendentals (sqrt/exp/log/trig/pow) at a configurable weight
(they run on a slower path).  Combined with the plan's compute-extent
ratio this yields an estimated VPU-bound throughput to report alongside
the HBM bound — claims about fused-sweep speedups must respect
min(HBM bound, VPU bound).
"""

from __future__ import annotations

from ..ir import expr as ir
from ..ir.program import StencilProgram

TRANSCENDENTAL_WEIGHT = 8.0
_TRANSCENDENTALS = {"sqrt", "rsqrt", "exp", "exp2", "log", "log2", "sin",
                    "cos", "tan", "tanh", "pow"}

# v5e VPU estimate: 8×128 lanes × 4 ALUs × ~0.94 GHz ≈ 3.85 Top/s f32.
# An ESTIMATE for reporting only (public per-part VPU numbers are not
# published the way MXU FLOPs are); stated explicitly in the report.
V5E_VPU_TOPS = 3.85


def expr_ops(e: ir.Expr) -> float:
    """Weighted op count over DISTINCT subexpressions: XLA CSEs repeated
    subtrees (e.g. heat3d's center tap appearing in all three directional
    terms), so counting every occurrence would overstate the VPU bound.
    IR nodes are frozen dataclasses — structural equality dedups exactly."""
    ops = 0.0
    seen: set = set()
    for n in ir.walk(e):
        if n in seen:
            continue
        seen.add(n)
        if isinstance(n, ir.BinOp):
            ops += 1
        elif isinstance(n, ir.UnOp):
            ops += 0 if n.op == "+" else 1
        elif isinstance(n, ir.Select):
            ops += 1
        elif isinstance(n, ir.Call):
            if n.fn in _TRANSCENDENTALS:
                ops += TRANSCENDENTAL_WEIGHT
            else:
                # k-ary reductions (min/max/...) cost k-1 ops — consistent
                # with tcse.count_minmax
                ops += max(len(n.args) - 1, 1)
        elif isinstance(n, ir.Cast):
            ops += 1
    return ops


# modeled VPU-op multipliers for paired-32-bit carriers (interp/wide64):
# add/sub ≈ 4 limb ops (adds + carry compare), mul ≈ 12 (16-bit half
# products + carries), compare/select/minmax ≈ 3; long division is a
# 64-step unrolled loop (~8 ops/step).  A single blended multiplier keeps
# the report honest without re-walking per-op; division-heavy programs
# are still underestimated (flagged in the report as modeled).
WIDE_PAIR_OP_WEIGHT = 6.0


def ops_per_cell(program: StencilProgram) -> float:
    """Weighted VPU ops per cell for ONE sweep of all stages.  Programs
    on the in-kernel 64-bit pair-carrier path cost ~WIDE_PAIR_OP_WEIGHT
    VPU ops per DSL op (modeled)."""
    from ..interp.wide64 import program_is_wide

    base = sum(expr_ops(t.expr) for t in program.tensors.values()
               if t.expr is not None)
    if program_is_wide(program):
        return base * WIDE_PAIR_OP_WEIGHT
    return base


def vpu_bound_gcells(program: StencilProgram,
                     compute_extent_ratio: float = 1.0) -> float:
    """Estimated VPU-bound GCell-updates/s on a v5e."""
    ops = ops_per_cell(program) * max(compute_extent_ratio, 1.0)
    if ops <= 0:
        return float("inf")
    return V5E_VPU_TOPS * 1e3 / ops  # Tops/s ÷ ops/cell = Gcell/s ×1e3
