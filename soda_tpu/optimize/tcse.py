"""Temporal common-subexpression elimination (computation reuse).

Reference analog: src/soda/optimization/tcse.py — the DAC 2020 "Exploiting
Computation Reuse for Stencil Accelerators" rewrite (SURVEY.md §2.1 L6,
reconstructed — empty mount).  The reference detects subexpressions repeated
at shifted offsets (convolution sum trees), hoists them into synthetic
`local` stages, and lets the reuse buffers carry partial sums, selecting the
decomposition with a DP/ILP (PuLP) search.

This TPU-native version implements the same rewrite with a greedy
generator/stride search instead of ILP:

  a flattened sum of taps  Σ_{o ∈ O} x(o)  is decomposed as
  Σ_{k=0}^{m-1} T(k·d)  with a new stage  T = Σ_{g ∈ G} x(g)
  whenever O = ⨄_k (G + k·d)  and  (|G|-1) + (m-1) < |O|-1.

On TPU the "reuse buffer carrying partial sums" is simply the hoisted
stage's VMEM block: the planner fuses T into its consumer with the right
halo, so each partial sum is computed once per cell and read m times as
shifted vector slices — identical dataflow to the reference's FIFO chains.

Numerical note: the rewrite REASSOCIATES the sum.  Exact for integer types;
for floats it perturbs results within normal fp tolerance (like the
reference's tcse, which also reorders reductions).  Off by default; enable
with `sodac --tcse` or `apply(program)`.
"""

from __future__ import annotations

import itertools

from ..ir import expr as ir
from ..ir.program import StencilProgram, Tensor


def _flatten_sum(e: ir.Expr) -> list[ir.Expr] | None:
    """Flatten a (((a+b)+c)+d) chain into [a, b, c, d]; None if not a sum."""
    if not (isinstance(e, ir.BinOp) and e.op == "+"):
        return None
    out: list[ir.Expr] = []

    def rec(n: ir.Expr) -> None:
        if isinstance(n, ir.BinOp) and n.op == "+":
            rec(n.lhs)
            rec(n.rhs)
        else:
            out.append(n)

    rec(e)
    return out


def _as_unit_refs(terms: list[ir.Expr]) -> tuple[str, list[tuple[int, ...]]] | None:
    """If every term is Ref(x, o) of one tensor, return (x, offsets)."""
    name = None
    offs = []
    for t in terms:
        if not isinstance(t, ir.Ref):
            return None
        if name is None:
            name = t.name
        elif t.name != name:
            return None
        offs.append(t.offsets)
    if name is None or len(set(offs)) != len(offs):
        return None  # duplicate taps: leave alone
    return name, offs


def _decompose(offsets: list[tuple[int, ...]]
               ) -> tuple[list[tuple[int, ...]], tuple[int, ...], int] | None:
    """Find (G, d, m) with offsets = ⨄_{k<m} (G + k·d) and positive savings."""
    oset = set(offsets)
    n = len(offsets)
    best = None
    seen_d = set()
    for a, b in itertools.permutations(offsets, 2):
        d = tuple(x - y for x, y in zip(a, b))
        if d in seen_d or all(x == 0 for x in d):
            continue
        seen_d.add(d)
        # generators: offsets with no predecessor along d
        gens = [o for o in oset
                if tuple(x - y for x, y in zip(o, d)) not in oset]
        if len(gens) >= n:
            continue
        # walk chains; all must have equal length m and tile oset exactly
        m = None
        ok = True
        for g in gens:
            k = 0
            cur = g
            while cur in oset:
                k += 1
                cur = tuple(x + y for x, y in zip(cur, d))
            if m is None:
                m = k
            elif k != m:
                ok = False
                break
        if not ok or m is None or m < 2:
            continue
        if len(gens) * m != n:
            continue
        cost = (len(gens) - 1) + (m - 1)
        if cost >= n - 1:
            continue
        key = (cost, sum(abs(x) for x in d))
        if best is None or key < best[0]:
            best = (key, gens, d, m)
    if best is None:
        return None
    _, gens, d, m = best
    return sorted(gens), d, m


def _rewrite_expr(e: ir.Expr, fresh, new_stages: dict[str, ir.Expr]) -> ir.Expr:
    """Top-down: replace decomposable sum chains with hoisted-stage sums.

    Top-down matters: a left-associated chain's prefixes are themselves sum
    nodes; rewriting the MAXIMAL chain first finds the full decomposition
    (e.g. the 3×3 box sum) instead of a partial one."""

    def try_chain(n: ir.Expr) -> ir.Expr | None:
        terms = _flatten_sum(n)
        if terms is None:
            return None
        unit = _as_unit_refs(terms)
        if unit is None:
            return None
        name, offs = unit
        dec = _decompose(offs)
        if dec is None:
            return None
        gens, d, m = dec
        # re-anchor the hoisted stage to center its own span: the composed
        # reach G ⊕ {k·d} equals O exactly, but stage values only exist on
        # the grid, so the border-invalid rim grows by the hoisted stage's
        # own radius — centering minimizes that growth.
        rank = len(gens[0])
        t = tuple((min(g[i] for g in gens) + max(g[i] for g in gens)) // 2
                  for i in range(rank))
        t_name = fresh(name)
        new_stages[t_name] = _build_sum(
            [ir.Ref(name, tuple(g[i] - t[i] for i in range(rank)))
             for g in gens])
        reps = [ir.Ref(t_name, tuple(k * d[i] + t[i] for i in range(rank)))
                for k in range(m)]
        return _build_sum(reps)

    def rec(n: ir.Expr) -> ir.Expr:
        hit = try_chain(n)
        if hit is not None:
            return hit
        if isinstance(n, ir.BinOp):
            return ir.BinOp(n.op, rec(n.lhs), rec(n.rhs))
        if isinstance(n, ir.UnOp):
            return ir.UnOp(n.op, rec(n.operand))
        if isinstance(n, ir.Call):
            return ir.Call(n.fn, tuple(rec(a) for a in n.args))
        if isinstance(n, ir.Cast):
            return ir.Cast(n.type, rec(n.operand))
        if isinstance(n, ir.Select):
            return ir.Select(rec(n.cond), rec(n.on_true), rec(n.on_false))
        return n

    return rec(e)


def _build_sum(terms: list[ir.Expr]) -> ir.Expr:
    out = terms[0]
    for t in terms[1:]:
        out = ir.BinOp("+", out, t)
    return out


def apply(program: StencilProgram, max_passes: int = 10) -> StencilProgram:
    """Return a new program with computation-reuse stages hoisted.

    Idempotent fixed point: passes repeat until no sum chain decomposes
    (hoisted stages themselves are candidates — multi-level reuse, e.g. a
    2D box sum becomes row-sum + column-sum of row-sums)."""
    tensors = {n: Tensor(t.name, t.type, t.expr, t.dram, t.tile_size, t.is_output)
               for n, t in program.tensors.items()}
    counter = [0]

    def fresh(base: str) -> str:
        counter[0] += 1
        return f"{base}__cse{counter[0]}"

    changed = True
    passes = 0
    while changed and passes < max_passes:
        changed = False
        passes += 1
        for name in list(tensors):
            t = tensors[name]
            if t.expr is None:
                continue
            new_stages: dict[str, ir.Expr] = {}
            e2 = _rewrite_expr(t.expr, fresh, new_stages)
            if new_stages:
                changed = True
                for sn, se in new_stages.items():
                    # hoisted partial sums need a WIDE type: narrow int
                    # stages would mask mid-sum (the original masks only at
                    # the final store).  int -> int32; float keeps width.
                    from ..ir.types import ScalarType

                    parent = next(iter(ir.get_load_names(se)))
                    pt = tensors[parent].type
                    st = pt if pt.is_float else ScalarType("int", 32)
                    tensors[sn] = Tensor(sn, st, se)
                tensors[name] = Tensor(t.name, t.type, e2, t.dram,
                                       t.tile_size, t.is_output)

    return StencilProgram(
        name=program.name,
        tensors=tensors,
        params=program.params,
        rank=program.rank,
        burst_width=program.burst_width,
        iterate=program.iterate,
        unroll_factor=program.unroll_factor,
        border=program.border,
        cluster=program.cluster,
    )


def count_adds(program: StencilProgram) -> int:
    """Total '+' nodes across stage expressions (the op-count metric the
    DAC'20 paper optimizes)."""
    n = 0
    for t in program.tensors.values():
        if t.expr is None:
            continue
        for node in ir.walk(t.expr):
            if isinstance(node, ir.BinOp) and node.op == "+":
                n += 1
    return n
