"""VMEM tiling / fusion planner — the TPU-native replacement for the
reference's reuse-buffer (line-buffer) planner.

Reference analog (SURVEY.md §3(b), reconstructed — empty mount): SODA's
core.py linearizes each stage's tap offsets against the tile size, partitions
them into `unroll_factor` reuse chains, and sizes FIFOs so that the total
buffer is max(offset)-min(offset)+k — full on-chip reuse with provably
minimal buffering.  On TPU the same window-span arithmetic becomes:

  * per-stage N-D spans (min/max tap offset per dim), propagated backward
    through the stage DAG to get each tensor's extent relative to the
    output block (the "reuse buffer" is a VMEM block + halo);
  * halo alignment to the (8,128) register tiling: exact halo on leading
    dims, 8-aligned halo on the sublane dim, and NO halo on the lane dim
    (lane taps are in-kernel vector shifts — the VPU analog of SODA's
    spatial unroll: `unroll_factor` is subsumed by 8×128-wide vector ops);
  * temporal `iterate` becomes in-kernel fused sweeps over a constant-extent
    VMEM buffer with halo sweeps×span (SODA's cascaded pipeline, §3(d));
  * multi-stage dataflow becomes producer/consumer stage fusion into one
    kernel while the combined halo fits the VMEM budget, else the DAG is
    split into chained kernels through HBM (SODA's dataflow modules ↔
    kernel groups);
  * block sizing maximizes useful-cells/HBM-byte under the VMEM budget —
    the analog of SODA's minimal-buffer theorem, inverted: buffer size is
    fixed (VMEM), minimize traffic.

Hardware constraints honored (verified empirically on v5e, see
scripts/tpu_check.py): Element-indexed window starts must be 8-aligned on
ALL tiled dims; window sizes on the last two dims must be (8,128)-aligned
or equal to the full dim; Element low/OOB padding is unsupported, so halos
are host-padded into the array.
"""

from __future__ import annotations

import dataclasses
import math

from ..ir.program import StencilProgram
from ..utils.config import lb_ep_eligible, lb_engine

Span = tuple[tuple[int, int], ...]  # per-dim (lo, hi), lo <= 0 <= hi

# fused sweeps up to this count run Python-unrolled with exact shrinking
# extents (trapezoid); beyond it, a constant-extent fori_loop keeps the
# Mosaic kernel size (and compile time) bounded.  Hardware-measured Mosaic
# compile times for the unrolled jacobi2d trapezoid at 1024x1024 (v5e,
# this round): 8 sweeps = 19 s, 12 = 36 s, 16 = 61 s, 24 = 141 s
# (~quadratic in depth).  16 keeps first-compile ~1 min — acceptable with
# the persistent cache — and the auto-sweep selector only picks a depth
# when its modeled min(HBM, VPU) bound beats shallower divisors.
TRAPEZOID_MAX_SWEEPS = 16

# Compute-pressure split: when the weighted per-cell op count of a fused
# group (utils/opcount: plain units for 32-bit programs, pair-carrier
# units for wide ones) exceeds this budget, the stage DAG is split into
# chained kernels through HBM even though VMEM would fit.  Giant single
# kernels are toxic at BOTH ends of the pipeline: Mosaic compile time
# grows superlinearly with kernel graph size (289 s observed for one DS
# trig chain), and XLA:CPU execution of interpret-mode kernels falls off
# a cliff (>5000x, measured this round: a ~25k-eqn grid-loop body runs
# 0.1 s, a ~29k-eqn one >9 min — mathfn_f64 with three extra DS calls).
# 600 pair-units ~= 10-15k jaxpr eqns per kernel, half the observed
# cliff.  Single stages over budget still emit (expression splitting is
# out of scope); deep-iterate programs cannot split (feedback loop).
KERNEL_OP_BUDGET = 600.0


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_bucket(vmem_bytes: int) -> int:
    """Candidate-key VMEM term, bucketed to 32 MiB: all strategies share
    the key shape (bpc, vmem_bucket, -cells) so cross-strategy ties
    compare commensurate quantities; the bucket steers equal-traffic
    ties away from the VMEM cliff (e.g. the ep march's 117 vs 61 MiB
    blocks) WITHOUT flipping small-footprint ties to tiny blocks (whose
    per-step overhead the byte model does not see)."""
    return vmem_bytes // (32 * 2**20)


def _uses_ds_float(program: StencilProgram) -> bool:
    """True when any user tensor/param computes as double-single f32
    pairs in-kernel (float width 64).

    DS programs DO NOT use the flat-unrolled trapezoid schedule: XLA:CPU's
    backend optimizations (active at --xla_backend_optimization_level >= 1;
    verified: level 0 is bit-exact vs eager) numerically rewrite the
    multi-sweep fused graph and the double-single error-free transforms
    lose their low limbs — two unrolled sweeps degrade from ~1e-15 to
    ~1e-8 median relative error (found round 3 by the wide fuzzer, seed
    77; minimal repro: 3 lane-shifted mul/add terms x 2 sweeps under one
    jit).  The constant-extent fori path traces ONE sweep per loop body,
    which the compiler cannot merge across iterations — measured
    bit-exact vs eager — so DS iterate programs fuse through fori (or
    chunked calls when auxiliary inputs need per-sweep windows).
    Integer pairs are unaffected (bitwise ops, fuzz-proven bit-exact);
    f32 programs tolerate ulp-level rewrites by contract."""
    return any(t.type.is_float and t.type.width == 64
               for t in program.tensors.values()) \
        or any(p.type.is_float and p.type.width == 64
               for p in program.params.values())


def _has_heavy_int_div(program: StencilProgram) -> bool:
    """True when any stage divides/mods by a NON-power-of-two value in a
    (possibly) integer context — the pair-carrier path lowers those to a
    64-step long division.  Conservative: float '/' in mixed programs may
    count (costing only fused sweeps, never correctness)."""
    from ..interp.evaluator import _const_pow2
    from ..ir import expr as ir_expr

    any_float_only = all(t.type.is_float for t in program.tensors.values())
    if any_float_only:
        return False
    for t in program.tensors.values():
        if t.expr is None:
            continue
        for n in ir_expr.walk(t.expr):
            if isinstance(n, ir_expr.BinOp) and n.op in ("/", "%"):
                if _const_pow2(n.rhs) is not None:
                    continue  # shift-optimized for both / and %
                return True
    return False


@dataclasses.dataclass
class GroupPlan:
    """One fused kernel: a set of stages executed in a single pallas_call."""

    stages: list[str]                    # topo order within the group
    external_inputs: list[str]           # tensors read from outside the group
    outputs: list[str]                   # tensors written back to HBM
    spans: dict[str, Span]               # extent of each tensor rel. to out block (one sweep)
    sweeps: int                          # fused temporal sweeps
    sweep_span: Span                     # per-sweep creep (= program output span) if sweeps > 1
    block: tuple[int, ...]               # out block shape; last dim = full extent
    grid: tuple[int, ...]                # grid over tiled dims (all but last)
    halo: dict[str, tuple[tuple[int, int], ...]]  # aligned host-pad per external input
    vmem_bytes: int
    hbm_bytes_per_call: int              # analytic traffic (incl. halo re-reads + pad copies)
    useful_cells_per_call: int
    compute_extent_ratio: float          # VPU overwork vs useful cells
    strategy: str = "windows"            # "windows" | "strips" | "linebuffer"
    # aligned-core hybrid (strips/linebuffer on non-8/16-aligned grids):
    # the kernel runs on the q-aligned core treating it as the whole grid;
    # a thin XLA-evaluated rim slab per unaligned leading dim overwrites
    # everything within the zero-fill creep of the core edge.  None = the
    # grid is aligned and no rim is needed.
    core: tuple[int, ...] | None = None
    # fused sweeps executed as a Python-unrolled chain with exact SHRINKING
    # extents (trapezoid schedule) instead of a constant-extent fori_loop —
    # cuts the per-sweep creep-margin recompute.  Capped at small sweep
    # counts: each unrolled sweep grows the Mosaic kernel.
    trapezoid: bool = False

    def describe(self) -> str:
        return (
            f"group(stages={self.stages}, {self.strategy}, sweeps={self.sweeps}, "
            f"block={self.block}, "
            f"grid={self.grid}, vmem={self.vmem_bytes/2**20:.2f}MiB, "
            f"traffic={self.hbm_bytes_per_call/max(self.useful_cells_per_call,1):.2f}B/cell-update, "
            f"compute_waste={self.compute_extent_ratio:.2f}x)"
        )


@dataclasses.dataclass
class Plan:
    program_name: str
    rank: int
    groups: list[GroupPlan]              # executed in order, chained through HBM
    grid_shape: tuple[int, ...]          # full problem extent this plan was built for
    notes: list[str]
    # per-sweep ideal HBM bytes per cell: program inputs read once + outputs
    # written once in their TPU storage dtypes (full on-chip reuse)
    ideal_bytes_per_cell: float = 8.0
    # total cell-updates per grid cell across the whole execution
    # (iterate × unrolled updates).  The N-sweep roofline divides the
    # per-sweep ideal by this: a perfectly fused iterate=N run still reads
    # and writes each cell once, so its per-UPDATE ideal is ideal/N —
    # reporting against it keeps every roofline fraction <= 100%.
    sweeps_total: int = 1

    def describe(self) -> str:
        out = [f"plan for {self.program_name} on grid {self.grid_shape}:"]
        out += ["  " + g.describe() for g in self.groups]
        out += ["  note: " + n for n in self.notes]
        return "\n".join(out)

    def to_json(self) -> dict:
        return {
            "program": self.program_name,
            "grid_shape": list(self.grid_shape),
            "groups": [
                {
                    "stages": g.stages,
                    "strategy": g.strategy,
                    "external_inputs": g.external_inputs,
                    "outputs": g.outputs,
                    "sweeps": g.sweeps,
                    "block": list(g.block),
                    "grid": list(g.grid),
                    "halo": {k: [list(p) for p in v] for k, v in g.halo.items()},
                    "vmem_bytes": g.vmem_bytes,
                    "hbm_bytes_per_call": g.hbm_bytes_per_call,
                    "useful_cells_per_call": g.useful_cells_per_call,
                    "bytes_per_cell_update": g.hbm_bytes_per_call / max(g.useful_cells_per_call, 1),
                    "compute_extent_ratio": g.compute_extent_ratio,
                    "core": None if g.core is None else list(g.core),
                    "trapezoid": g.trapezoid,
                }
                for g in self.groups
            ],
            "notes": self.notes,
            "ideal_bytes_per_cell": self.ideal_bytes_per_cell,
            "sweeps_total": self.sweeps_total,
        }


def group_spans(program: StencilProgram, stages: list[str],
                outputs: list[str]) -> dict[str, Span]:
    """Backward-propagate required extents (relative to the output block)
    through the group's stage DAG — SODA's cumulative window math in N-D."""
    rank = program.rank
    spans: dict[str, Span] = {o: tuple((0, 0) for _ in range(rank)) for o in outputs}
    for name in reversed(stages):
        s = spans.get(name)
        if s is None:
            continue  # stage not needed by this group's outputs
        t = program.tensors[name]
        for parent, offs in t.window().items():
            base = spans.get(parent, tuple((0, 0) for _ in range(rank)))
            lo = [b[0] for b in base]
            hi = [b[1] for b in base]
            for off in offs:
                for d in range(rank):
                    lo[d] = min(lo[d], s[d][0] + off[d])
                    hi[d] = max(hi[d], s[d][1] + off[d])
            spans[parent] = tuple(zip(lo, hi))
    return spans


def _align_halo(span: Span, sweeps: int, sweep_span: Span, rank: int,
                q: int = 8) -> tuple[tuple[int, int], ...]:
    """Host-pad amounts per dim for an external input.

    Total halo = one-sweep span + (sweeps-1) × per-sweep creep.  Alignment:
    leading dims exact; sublane dim (rank-2) rounded up to the storage
    tile quantum `q` per side (8 for 32-bit, 16 for 16-bit containers);
    lane dim (rank-1) ZERO (lane taps are in-kernel shifts, never window
    halo)."""
    out = []
    for d in range(rank):
        lo = -span[d][0] + (sweeps - 1) * -sweep_span[d][0]
        hi = span[d][1] + (sweeps - 1) * sweep_span[d][1]
        if d == rank - 1:
            out.append((0, 0))
        elif d == rank - 2:
            out.append((_round_up(lo, q), _round_up(hi, q)))
        else:
            out.append((lo, hi))
    return tuple(out)


def _group_io(program: StencilProgram, members: list[str]
              ) -> tuple[list[str], list[str]]:
    """(external_inputs, outputs) of a candidate stage set: inputs are
    tensors read from outside; outputs are members visible outside (program
    outputs, or read by a stage not in the set)."""
    mset = set(members)
    ext: dict[str, None] = {}
    for s in members:
        for p in program.tensors[s].parents():
            if p not in mset:
                ext.setdefault(p, None)
    cons = program.consumers()
    outs = [s for s in members
            if program.tensors[s].is_output
            or any(c not in mset for c in cons[s])]
    return list(ext), outs


def _plan_group(
    program: StencilProgram,
    members: list[str],
    grid_shape: tuple[int, ...],
    *,
    vmem_budget: int,
    max_compute_waste: float,
    nf: int,
    block_override: tuple[int, ...] | None,
    updates_per_cell: int = 1,
    wide: bool = False,
) -> GroupPlan | None:
    """Pick the best block for one fused stage group; None if infeasible.

    wide: 64-bit pair-carrier program — doubles the VMEM model (limb
    temporaries stay live across the two-plane evaluation) and sizes
    intermediates at 8 B/cell.  EVERY strategy (windows, strips, 2-D and
    3-D linebuffer) accepts pair carriers."""
    rank = program.rank
    ext_inputs, outputs = _group_io(program, members)
    spans = group_spans(program, members, outputs)
    # prune dead stages (no path to a group output): they have no required
    # extent and are never materialized — same as the reference's dataflow
    # graph dropping consumer-less modules
    members = [m for m in members if m in spans]
    ext_inputs = [i for i in ext_inputs if i in spans]

    if nf > 1:
        out_span = program.cumulative_span(program.output_names[0])
    else:
        out_span = tuple((0, 0) for _ in range(rank))
    # NON-CANCELLING one-sweep creep of the group chain: the margin every
    # CONSTANT-EXTENT evaluation needs (fori sweep bodies, 3-D line-buffer
    # slabs, rim slabs).  >= the composed span; differs on mixed-sign
    # chains (a stage reading +1 consumed at -2 does not cancel).
    creep1 = program.chain_creep(members, outputs)
    # Per-sweep creep for FUSED sweeps: the union of the non-cancelling
    # chain creep (constant-extent fori semantics: zero-fill bands escape
    # through negative taps) and every external input's composed one-sweep
    # span (EXACT-extent trapezoid semantics: the next sweep can need rows
    # on the side the chain creep cancelled — a stage tapping +1 whose
    # consumer taps -2 still needs the +1 row of last sweep's output;
    # found by fuzz seed 141, shapes silently clamped by 1 row/sweep).
    creep_fuse = tuple(
        (min([creep1[d][0]] + [spans[i][d][0] for i in ext_inputs
                               if i in spans]),
         max([creep1[d][1]] + [spans[i][d][1] for i in ext_inputs
                               if i in spans]))
        for d in range(rank))

    # fused-sweep schedule: shallow depths run the Python-unrolled exact-
    # extent trapezoid, EXCEPT for double-single programs (fori only —
    # see _uses_ds_float); deeper depths take the constant-extent fori
    use_trap = (nf > 1 and nf <= TRAPEZOID_MAX_SWEEPS
                and not _uses_ds_float(program))

    def io_bytes(name: str) -> int:
        return program.tensors[name].type.tpu_storage_bytes

    # sublane quantum: the coarsest storage tile among group i/o tensors
    # (16-bit containers tile at (16,128))
    q = max([program.tensors[n].type.sublane_quantum
             for n in list(ext_inputs) + list(outputs)] or [8])

    def _sweep_margin(i: str) -> Span:
        """Window margin for input i: its composed span for one sweep
        (exact-extent evaluation); nf x chain creep for fused sweeps (the
        fori path evaluates at constant extent where offset signs do not
        cancel; creep >= any input's composed span by construction, and
        the trapezoid path needs less but stays correct)."""
        if nf == 1:
            return spans.get(i, tuple((0, 0) for _ in range(rank)))
        return tuple((nf * creep_fuse[d][0], nf * creep_fuse[d][1])
                     for d in range(rank))

    halo = {
        i: _align_halo(_sweep_margin(i), 1,
                       tuple((0, 0) for _ in range(rank)), rank, q)
        for i in ext_inputs
    }
    # strips variant: leading-dim strips must also be tile-quantum-aligned
    # (Element starts on dim 0 need divisibility by 8 — empirical Mosaic
    # rule), so leading halos round up to 8 as well
    halo_strips = {}
    for i in ext_inputs:
        hs = []
        for d in range(rank):
            lo, hi = halo[i][d]
            if d < rank - 2:
                hs.append((_round_up(lo, 8), _round_up(hi, 8)))
            else:
                hs.append((lo, hi))
        halo_strips[i] = tuple(hs)
    # compute/intermediate bytes: f32/int32, or paired-32-bit carriers
    # when the program has 64-bit tensors (pair-carrier wide mode)
    dtype_bytes = 8 if wide else 4

    # ---- aligned-core hybrid bookkeeping (pad-free strategies on grids
    # whose leading dims are not tile-quantum aligned): the kernel runs on
    # the rounded-down core as if it were the whole grid; outputs within
    # `creep` of the core's hi edge are invalid (zero-filled taps) and a
    # thin XLA rim slab re-computes [core - creep, D) per unaligned dim ---
    creep = []      # invalid output depth at a zero-filled hi core edge
    lo_reach = []   # input reach below an output row (for rim slab sizing)
    for d in range(rank - 1):
        # rim slabs evaluate at CONSTANT extent: non-cancelling chain
        # creep per sweep (union with input spans when sweeps fuse — the
        # trapezoid schedule consumes the larger margin)
        c = creep1[d] if nf == 1 else creep_fuse[d]
        creep.append(nf * c[1])
        lo_reach.append(nf * -c[0])
    core = tuple(grid_shape[d] // q * q for d in range(rank - 1)) \
        + (grid_shape[-1],)
    hybrid_dims = [d for d in range(rank - 1) if core[d] != grid_shape[d]]

    def rim_traffic() -> int:
        """Honest rim bytes: slab reads + rim writes per unaligned dim
        (assumes XLA fuses the slab slice into the rim evaluation and the
        stitch dynamic-update-slice is in-place)."""
        in_io = sum(io_bytes(i) for i in ext_inputs)
        out_io = sum(io_bytes(o) for o in outputs)
        total = 0
        for d in hybrid_dims:
            others = math.prod(
                grid_shape[k] for k in range(rank) if k != d)
            keep = grid_shape[d] - (core[d] - creep[d])
            total += (keep + lo_reach[d]) * others * in_io * nf
            total += keep * others * out_io
        return total

    def core_ok(block) -> bool:
        return all(core[d] >= max(block[d], creep[d] + lo_reach[d], q)
                   for d in range(rank - 1))

    def candidates():
        if block_override is not None:
            yield tuple(block_override)
            return
        if rank == 1:
            # lane-dim-only programs: one full-extent block, no tiled dims
            yield (grid_shape[0],)
            return
        if rank == 2:
            for bh in (1024, 768, 512, 384, 256, 192, 128, 96, 64, 48,
                       32, 24, 16, 8):
                if bh % q == 0:
                    yield (bh, grid_shape[1])
        elif rank == 3:
            for bz in (64, 48, 32, 24, 16, 8):
                for by in (256, 192, 128, 96, 64, 48, 32, 16, 8):
                    if bz % q == 0 and by % q == 0:
                        yield (bz, by, grid_shape[2])
        else:
            # rank-general: tile every leading dim from a shared ladder,
            # lane dim always full extent (rank >= 4 is exotic for stencils
            # but the DSL allows it — SURVEY.md §2.4 N-D offsets)
            import itertools as it

            ladders = [(64, 32, 16, 8)] * (rank - 1)
            for combo in it.product(*ladders):
                if all(b % q == 0 for b in combo):
                    yield combo + (grid_shape[-1],)

    def evaluate(block, halo, strips=False, shape=None):
        shape = grid_shape if shape is None else shape
        grid = []
        for d in range(rank - 1):
            grid.append(_round_up(shape[d], block[d]) // block[d])
        win_bytes = 0
        for i in ext_inputs:
            w = 1
            for d in range(rank):
                w *= block[d] + halo[i][d][0] + halo[i][d][1]
            win_bytes += w * io_bytes(i)
        out_bytes = sum(math.prod(block) * io_bytes(o) for o in outputs)
        inter = 0
        for s in members:
            if s in outputs:
                continue
            sp = spans.get(s, tuple((0, 0) for _ in range(rank)))
            e = 1
            for d in range(rank):
                if nf > 1:
                    # constant-extent fori working set: every stage value
                    # lives at the full nf x creep window
                    lo = nf * -creep_fuse[d][0]
                    hi = nf * creep_fuse[d][1]
                else:
                    lo = -sp[d][0]
                    hi = sp[d][1]
                e *= block[d] + lo + hi
            inter += e * dtype_bytes
        vmem = 2 * (win_bytes + out_bytes) + inter
        if strips:
            vmem += win_bytes  # assembled window copy lives alongside pieces
        if nf > 1:
            # fused-sweep working set: the (trapezoid or fori) sweep chain
            # keeps ~2 extra window-sized values live (calibrated on v5e:
            # heat3d it=4 strips (64,256,256) modeled 95.8 MiB WITHOUT this
            # term fails VMEM allocation; (32,256,256) at 54 MiB runs)
            vmem += 2 * win_bytes
        if wide:
            # pair-carrier kernels keep limb temporaries live across the
            # two-plane evaluation: hardware probe (accum64 strips
            # (1024,2048), modeled 80.75 MiB) failed Mosaic allocation at
            # 144.46M of 128M — ~1.8x the model; budget 2x
            vmem *= 2
        nblocks = math.prod(grid)
        reads = win_bytes * nblocks
        writes = out_bytes * nblocks
        # host-pad copy traffic: every input with a non-zero halo is
        # materialized as a padded copy (read original + write padded)
        # once per kernel call — real HBM bytes, counted honestly
        pad_bytes = 0
        for i in ext_inputs:
            if strips:
                break
            if any(halo[i][d][0] or halo[i][d][1] for d in range(rank)):
                orig = math.prod(grid_shape)
                padded = 1
                for d in range(rank - 1):
                    padded *= grid[d] * block[d] + halo[i][d][0] + halo[i][d][1]
                padded *= grid_shape[-1]
                pad_bytes += (orig + padded) * io_bytes(i)
        useful = (math.prod(grid_shape) * nf * max(len(outputs), 1)
                  * updates_per_cell)
        max_ext = math.prod(block)
        if ext_inputs:
            i0 = ext_inputs[0]
            max_ext = 1
            for d in range(rank):
                max_ext *= block[d] + halo[i0][d][0] + halo[i0][d][1]
        if use_trap:
            # trapezoid schedule: sweep s computes extent block + m*creep
            # (m = remaining sweeps), not the constant full window —
            # compute waste is the trapezoid volume, not the prism
            total_ext = 0
            for s in range(nf):
                m = nf - 1 - s
                e = 1
                for d in range(rank - 1):
                    # extents grow by the fused-sweep creep union
                    # (matches the kernel's trapezoid schedule)
                    e *= (block[d]
                          + m * (creep_fuse[d][1] - creep_fuse[d][0]))
                total_ext += e * block[rank - 1]
            waste = total_ext / (nf * math.prod(block))
        else:
            waste = max_ext / math.prod(block)
        return dict(grid=tuple(grid), vmem=vmem,
                    traffic=reads + writes + pad_bytes,
                    useful=useful, waste=waste)

    best = None
    strategy = "windows"
    for block in candidates():
        # reject blocks larger than the (quantum-rounded) grid — EXCEPT
        # that 16/32-quantum dtypes need at least one quantum-sized block
        # even on tiny extents (e.g. rank-1 programs lifted to (1, X)
        # with uint16 storage: the minimum legal block is 16 rows)
        if any(block[d] > _round_up(grid_shape[d], q) for d in range(rank - 1)):
            continue
        ev = evaluate(block, halo)
        if ev["vmem"] <= vmem_budget and not (
                ev["waste"] > max_compute_waste and nf > 1):
            bpc = ev["traffic"] / ev["useful"]
            key = (bpc, _vmem_bucket(ev["vmem"]), -math.prod(block))
            if best is None or key < best[0]:
                best = (key, block, ev, "windows")
        # pad-free strips variant: runs on the q-aligned CORE (the whole
        # grid when aligned; rounded down + XLA rim otherwise).  Within the
        # core the last block clamps and overlaps — idempotent recompute —
        # provided any remainder can host the hi halo strip.
        def strips_ok():
            if not core_ok(block):
                return False
            for d in range(rank - 1):
                D, B = core[d], block[d]
                if D < B:
                    return False
                rem = D % B
                hmax_lo = max((halo_strips[i][d][0] for i in ext_inputs),
                              default=0)
                hmax_hi = max((halo_strips[i][d][1] for i in ext_inputs),
                              default=0)
                # strip starts clamp against the core ends; an interior
                # block's strip must never hit the clamp, so the block must
                # be at least as wide as the halo on each side
                if B < hmax_lo or B < hmax_hi:
                    return False
                if rem and rem < hmax_hi:
                    return False
            return True

        # wide (pair-carrier) programs use strips too: pieces are
        # per-plane 32-bit arrays, and the hybrid XLA rim path evaluates
        # pairs (Python-looped sweeps; _eval_group_slab)
        if strips_ok():
            evs = evaluate(block, halo_strips, strips=True, shape=core)
            evs["traffic"] += rim_traffic()
            if evs["vmem"] <= vmem_budget and not (
                    evs["waste"] > max_compute_waste and nf > 1):
                bpc = evs["traffic"] / evs["useful"]
                key = (bpc, _vmem_bucket(evs["vmem"]), -math.prod(block))
                if best is None or key < best[0]:
                    best = (key, block, evs, "strips")

    # -- line-buffer row-march (rank-2, single sweep): Blocked row slabs
    #    over the sublane dim with R carried rows in persistent VMEM
    #    scratch — one HBM read per cell (the 2-D form of SODA's line
    #    buffer).  Carry and lookahead are rounded to the sublane quantum
    #    so every concat/slice in the kernel is tile-aligned (round 1's
    #    unaligned sublane concat is what hung Mosaic). ------------------
    if (rank == 2 and nf == 1 and block_override is None
            and ext_inputs):
        # wide (pair-carrier) programs ride the line buffer too: planes
        # stream as two 32-bit operands with two plane carries (the
        # io_bytes/dtype_bytes terms below already count 8 B/cell)
        H, W = grid_shape
        Hc = core[0]
        r_lo = max(-spans[i][0][0] for i in ext_inputs)
        r_hi = max(spans[i][0][1] for i in ext_inputs)
        if r_lo or r_hi:
            rlo8 = _round_up(r_lo, q)
            rhi8 = _round_up(r_hi, q) if r_hi else 0
            in_io = sum(io_bytes(i) for i in ext_inputs)
            out_io = sum(io_bytes(o) for o in outputs)
            for bh in (8, 16, 24, 32, 48, 64, 128):
                if Hc % bh or bh % q or bh < rhi8 or bh < rlo8:
                    continue
                if hybrid_dims and not core_ok((bh, W)):
                    continue
                G = Hc // bh
                S = bh + rlo8 + rhi8  # slab rows
                vmem = (2 * bh * W * in_io          # double-buffered blocks
                        + 2 * bh * W * out_io
                        + (bh + rlo8) * W * in_io   # carry scratch
                        + S * W * dtype_bytes * (len(ext_inputs)
                                                 + len(members) + 1))
                if wide:
                    # pair-carrier limb temporaries stay live across the
                    # two-plane evaluation (same 2x as evaluate())
                    vmem *= 2
                if vmem > vmem_budget:
                    continue
                # engine-dependent final-step fetch: the emit_pipeline
                # march elides the flush step's re-fetch (copy-in fires
                # only when the block index changes — utils/config.py);
                # unaligned lane dims fall back to the mosaic march
                # (Mosaic rejects unaligned memref_slice lane extents)
                lb_extra = (0 if lb_engine() == "ep"
                            and lb_ep_eligible(W) else 1)
                reads = (G + lb_extra) * bh * W * in_io
                writes = H * W * out_io
                useful = H * W * max(len(outputs), 1) * updates_per_cell
                waste = (bh + r_lo + r_hi) / bh  # exact-extent stage eval
                bpc = (reads + writes + rim_traffic()) / useful
                # bucketed VMEM breaks traffic ties (the ep engine's
                # traffic is block-size-independent): the smaller carry
                # keeps clear of the hardware cliff — see _vmem_bucket
                key = (bpc, _vmem_bucket(vmem), -bh)
                if best is None or key < best[0]:
                    halo_lb = {i: ((rlo8, rhi8), (0, 0)) for i in ext_inputs}
                    best = (key, (bh, W),
                            dict(grid=(G + 1,), vmem=vmem,
                                 traffic=reads + writes + rim_traffic(),
                                 useful=useful, waste=waste,
                                 halo_lb=halo_lb), "linebuffer")

    # -- line-buffer z-march (rank-3, single sweep): Blocked slabs over the
    #    leading dim with R carried planes in persistent VMEM scratch —
    #    no halo re-reads, no host-pad copies (the VMEM analog of SODA's
    #    line buffer, one-read-per-cell) --------------------------------
    # pair-aware since round 3: wide tensors ride two plane operands with
    # plane carries.  io_bytes() counts 8 B/cell for 64-bit types (their
    # HBM traffic); the pair-carrier VMEM overhead comes from the
    # `vmem *= 2` below, NOT from the I/O terms.
    if rank == 3 and nf == 1 and block_override is None:
        Z, Y, X = grid_shape
        Zc, Yc = core[0], core[1]  # == Z, Y when the grid is aligned
        # slab margins: the kernel evaluates stages at CONSTANT slab
        # extent (_shift_all), so margins use the non-cancelling chain
        # creep, not the composed input spans
        rz_lo = -creep1[0][0]
        rz_hi = creep1[0][1]
        ry = max(-creep1[1][0], creep1[1][1])
        y_cands = [Yc] + [b for b in (512, 256, 128, 64, 32)
                          if b < Yc and Yc % b == 0 and b % q == 0]
        for bz in (8, 16, 24, 32, 48, 64):
            # one-block lookahead: the high halo must fit in the next block
            if Zc % bz != 0 or bz < rz_hi or bz % q != 0:
                continue
            if hybrid_dims and not core_ok((bz, y_cands[0], X)):
                continue
            G = Zc // bz
            for by in y_cands:
                hy = 0 if by == Yc else _round_up(ry, q)
                if by != Yc and hy == 0 and ry > 0:
                    hy = q
                # interior y-strips clamp against the array ends; the halo
                # must fit within the block or clamped strips misalign
                if hy > by:
                    continue
                wy = by + 2 * hy
                Gy = Yc // by
                block = (bz, by, X)
                plane_c = wy * X * dtype_bytes
                in_io = sum(io_bytes(i) for i in ext_inputs)
                out_io = sum(io_bytes(o) for o in outputs)
                slab_bytes = (bz + rz_lo + rz_hi) * plane_c
                carry_bytes = (bz + rz_lo) * wy * X * in_io
                # intermediates: slab-sized temporaries.  Calibrated on
                # v5e: SINGLE-stage groups need ~2 slabs (jacobi3d
                # (8,512,1024) = 125 MiB by this model compiles and runs;
                # (8,1024,1024) = 244 MiB fails), while MULTI-stage groups
                # need the conservative n_in+members+1 (denoise3d
                # (8,512,512) modeled at 116 MiB with members+1 fails)
                n_tmp = (len(members) + 1 if len(members) == 1
                         else len(ext_inputs) + len(members) + 1)
                vmem = (2 * bz * wy * X * in_io
                        + 2 * bz * by * X * out_io
                        + carry_bytes
                        + slab_bytes * n_tmp)
                if wide:
                    # pair-carrier limb temporaries (same 2x as evaluate())
                    vmem *= 2
                # linebuffer-specific headroom: the probes above bound the
                # real feasibility at ~126 MiB of modeled bytes on the
                # 128-MiB-VMEM v5e, above the general-purpose default
                # budget (which stays conservative for windows/strips).
                # Scale proportionally so explicit small budgets (tests
                # forcing splits) are still respected.
                lb_budget = min(vmem_budget * 126 // 96, 126 * 2**20)
                if vmem > lb_budget:
                    continue
                # engine-dependent final-step fetch (see the 2-D branch);
                # ep also needs a 128-aligned lane dim and hy | by for
                # the y-strip piece BlockSpecs
                lb_extra = (0 if lb_engine() == "ep"
                            and lb_ep_eligible(X, hy, by) else 1)
                reads = Gy * (G + lb_extra) * bz * wy * X * in_io
                writes = Z * Y * X * out_io
                useful = Z * Y * X * max(len(outputs), 1) * updates_per_cell
                waste = ((bz + rz_lo + rz_hi) * wy) / (bz * by)
                bpc = (reads + writes + rim_traffic()) / useful
                # bucketed VMEM breaks traffic ties (see _vmem_bucket)
                key = (bpc, _vmem_bucket(vmem), -bz * by)
                if best is None or key < best[0]:
                    halo_lb = {
                        i: ((0, 0), (hy, hy), (0, 0)) for i in ext_inputs}
                    best = (key, block,
                            dict(grid=(Gy, G + 1), vmem=vmem,
                                 traffic=reads + writes + rim_traffic(),
                                 useful=useful, waste=waste,
                                 halo_lb=halo_lb), "linebuffer")

    if best is None:
        return None
    _, block, ev, strategy = best
    return GroupPlan(
        stages=list(members),
        external_inputs=ext_inputs,
        outputs=outputs,
        spans=spans,
        sweeps=nf,
        # per-sweep creep for the trapezoid schedule: the fused-sweep
        # creep UNION (chain creep ∪ input spans) — mixed-sign stage
        # chains need margins on the side the chain creep cancels (fuzz
        # seed 141: under-provisioned extents clamp slices by 1 row/sweep)
        sweep_span=creep_fuse,
        block=block,
        grid=ev["grid"],
        halo=(halo if strategy == "windows" else
              halo_strips if strategy == "strips" else
              ev.get("halo_lb",
                     {i: tuple((0, 0) for _ in range(rank))
                      for i in ext_inputs})),
        vmem_bytes=ev["vmem"],
        hbm_bytes_per_call=ev["traffic"],
        useful_cells_per_call=ev["useful"],
        compute_extent_ratio=ev["waste"],
        strategy=strategy,
        core=(core if strategy in ("strips", "linebuffer") and hybrid_dims
              else None),
        trapezoid=(use_trap and strategy in ("windows", "strips")),
    )


def plan(
    program: StencilProgram,
    grid_shape: tuple[int, ...],
    *,
    vmem_budget: int = 96 * 2**20,
    max_compute_waste: float = 3.0,
    sweeps: int | None = None,
    iterate: int | None = None,
    block_override: tuple[int, ...] | None = None,
    updates_per_cell: int = 1,
    kernel_op_budget: float = KERNEL_OP_BUDGET,
) -> Plan:
    """Build an execution plan for `program` on a full grid of `grid_shape`.

    Fusion policy: fuse ALL stages into one kernel when the combined halo
    fits the VMEM budget; otherwise split the stage DAG greedily (in topo
    order) into chained kernel groups through HBM — the analog of SODA's
    multi-module dataflow when on-chip resources run out.  Temporal sweeps
    are fully fused unless the halo would eat more than `max_compute_waste`
    of the block, in which case sweeps are chunked and the kernel chain is
    invoked iterate/chunk times (the reference planner's iterate-halo-blowup
    heuristic, SURVEY.md §7 'hard parts')."""
    if len(grid_shape) != program.rank:
        raise ValueError(
            f"grid rank {len(grid_shape)} != program rank {program.rank}")
    notes: list[str] = []
    stages = program.stage_order()
    # `iterate` overrides the DSL count (run(iterate=...), mesh exchange
    # chunks, host-tile passes).  Every divisor adjustment below MUST
    # target this EFFECTIVE count: fused sweeps that divide the DSL
    # count but not the executed count make build_fn's chunk loop
    # silently under-execute (review r5 — reproduced: iterate=12,
    # override 6, plan sweeps 4 -> 1 chunk of 4 sweeps claimed as 6).
    it = max(program.iterate if iterate is None else iterate, 1)
    from ..interp.wide64 import program_is_wide

    wide = program_is_wide(program)
    if wide:
        notes.append(
            "64-bit tensors: paired-32-bit carriers in-kernel "
            "(windows/strips strategies); fused sweeps run the trapezoid "
            f"schedule up to {TRAPEZOID_MAX_SWEEPS}, then a pair-carrying "
            "constant-extent fori_loop")

    def whole(nf):
        return _plan_group(
            program, stages, grid_shape, vmem_budget=vmem_budget,
            max_compute_waste=max_compute_waste, nf=nf,
            block_override=block_override, updates_per_cell=updates_per_cell,
            wide=wide)

    # compute-pressure split decision (see KERNEL_OP_BUDGET): weighted
    # per-cell op count per stage, in the units the program's path pays
    # (pair-carrier units for wide programs)
    from ..utils.opcount import expr_ops, expr_ops_wide

    stage_w = {
        s: (expr_ops_wide(program.tensors[s].expr, program) if wide
            else expr_ops(program.tensors[s].expr))
        for s in stages}
    over_compute = (it == 1 and len(stages) > 1
                    and sum(stage_w.values()) > kernel_op_budget)

    # 1) whole-program fusion at the requested sweep count, backing off
    #    sweeps on halo blowup (fused sweeps must divide iterate — a
    #    non-divisor would silently under-execute sweeps in chunked calls)
    nf = it if sweeps is None else max(1, min(sweeps, it))
    wide_div = wide and _has_heavy_int_div(program)
    if wide_div and nf > 1:
        # each fused sweep replicates the 64-step pair long division in
        # the unrolled trapezoid — XLA/Mosaic compile time explodes
        # (observed: XLA:CPU >90 s at 4 sweeps x 1 division).  Division
        # by constant powers of two is shift-optimized and exempt.
        nf = 1
        notes.append(
            "wide integer division: fused sweeps disabled "
            "(64-step pair division per sweep — compile-cost guard)")
    ds_float = _uses_ds_float(program)
    if ds_float and len(program.input_names) > 1 and nf > 1:
        # double-single programs cannot use the trapezoid (see
        # _uses_ds_float) and the fori carry is the feedback tensor alone,
        # so aux-input DS programs run chunked single-sweep calls
        nf = 1
        notes.append(
            "double-single + auxiliary inputs: fused sweeps disabled "
            "(trapezoid unavailable for DS, fori cannot carry aux windows)")
    if len(program.input_names) > 1 and nf > TRAPEZOID_MAX_SWEEPS:
        # auxiliary iterate inputs require the trapezoid kernel path (the
        # constant-extent fori carries only the feedback tensor): cap fused
        # sweeps and run more chunked calls instead
        nf = TRAPEZOID_MAX_SWEEPS
        notes.append(
            f"auxiliary inputs: fused sweeps capped at {nf} (trapezoid)")
    while it % nf != 0:
        nf -= 1
    if sweeps is not None and nf != sweeps:
        notes.append(f"requested sweeps {sweeps} adjusted to divisor {nf} "
                     f"of iterate {it}")
    if sweeps is None and it > 1:
        # AUTO sweep selection: maximal fusion minimizes HBM traffic but
        # deep fori chains pay the constant-extent compute waste, while a
        # shallower trapezoid (<= TRAPEZOID_MAX_SWEEPS) costs more traffic
        # and less VPU.  Score every divisor of `iterate` by the modeled
        # min(HBM bound, VPU bound) and take the best feasible.
        from ..utils.opcount import ops_per_cell, vpu_bound_gcells
        from ..utils.report import V5E_HBM_GBPS

        ops = ops_per_cell(program)
        # auxiliary-input programs can only fuse sweeps on the trapezoid
        # path (the fori carry is the feedback tensor alone); wide
        # division caps at one sweep (compile-cost guard above).  Plain
        # wide programs fuse freely — the fori carry rides W pair
        # carriers (pytree) beyond the trapezoid cap.
        nf_cap = (1 if wide_div
                  or (ds_float and len(program.input_names) > 1) else
                  TRAPEZOID_MAX_SWEEPS
                  if len(program.input_names) > 1 else it)
        best_nf, best_score, best_g = None, -1.0, None
        for cand in sorted({d for d in range(1, it + 1)
                            if it % d == 0 and d <= nf_cap}):
            gc = whole(cand)
            if gc is None:
                continue
            bpc = gc.hbm_bytes_per_call / max(gc.useful_cells_per_call, 1)
            hbm = V5E_HBM_GBPS / bpc
            vpu = (vpu_bound_gcells(program, gc.compute_extent_ratio)
                   if ops > 0 else float("inf"))
            score = min(hbm, vpu)
            if score > best_score:
                best_nf, best_score, best_g = cand, score, gc
        if best_g is not None:
            if best_nf != nf:
                notes.append(
                    f"auto sweeps: {best_nf} fused sweeps chosen over {nf} "
                    f"on the modeled min(HBM, VPU) bound")
            nf, g = best_nf, best_g
        else:
            g = None
    else:
        g = None if over_compute else whole(nf)
    while g is None and nf > 1:
        nf = max(1, nf // 2)
        while it % nf != 0:
            nf -= 1
        notes.append(f"halo blowup: reduced fused sweeps to {nf}")
        g = whole(nf)
    ideal = float(
        sum(program.tensors[n].type.tpu_storage_bytes for n in program.input_names)
        + sum(program.tensors[n].type.tpu_storage_bytes for n in program.output_names))
    if g is not None:
        notes.append(
            f"iterate={it} executed as {it // nf} kernel call(s) × {nf} fused sweeps")
        if g.trapezoid and nf > 8:
            notes.append(
                f"deep trapezoid ({nf} sweeps): first Mosaic compile takes "
                f"~1-2 min (cached thereafter); --sweeps 8 trades HBM "
                f"traffic for compile time")
        return Plan(program.name, program.rank, [g], tuple(grid_shape), notes,
                    ideal_bytes_per_cell=ideal,
                    sweeps_total=it * updates_per_cell)

    # 2) split the stage DAG into chained groups (iterate>1 cannot split:
    #    the feedback loop needs the whole pipeline per sweep)
    if it > 1:
        raise ValueError(
            f"no feasible block for grid {grid_shape} under vmem budget "
            f"{vmem_budget} (program {program.name}, iterate={it})")
    groups: list[GroupPlan] = []
    cur: list[str] = []
    cur_plan: GroupPlan | None = None
    for s in stages:
        trial = cur + [s]
        gp = None
        # budget gate first: a trial over the op budget splits here even
        # if VMEM would fit (single stages always emit)
        if not (cur and sum(stage_w[t] for t in trial) > kernel_op_budget):
            gp = _plan_group(
                program, trial, grid_shape, vmem_budget=vmem_budget,
                max_compute_waste=max_compute_waste, nf=1,
                block_override=block_override,
                updates_per_cell=updates_per_cell, wide=wide)
        if gp is not None:
            cur, cur_plan = trial, gp
            continue
        if cur_plan is None:
            raise ValueError(
                f"stage {s!r} alone does not fit vmem budget {vmem_budget} "
                f"on grid {grid_shape}")
        groups.append(cur_plan)
        cur = [s]
        cur_plan = _plan_group(
            program, cur, grid_shape, vmem_budget=vmem_budget,
            max_compute_waste=max_compute_waste, nf=1,
            block_override=block_override, updates_per_cell=updates_per_cell,
            wide=wide)
        if cur_plan is None:
            raise ValueError(
                f"stage {s!r} alone does not fit vmem budget {vmem_budget} "
                f"on grid {grid_shape}")
    if cur_plan is not None:
        groups.append(cur_plan)
    notes.append(
        f"{'compute' if over_compute else 'VMEM'} pressure: split "
        f"{len(stages)} stages into {len(groups)} chained kernel groups"
        + (f" (weighted ops {sum(stage_w.values()):.0f} > "
           f"budget {kernel_op_budget:.0f}/kernel)" if over_compute else ""))
    return Plan(program.name, program.rank, groups, tuple(grid_shape), notes,
                ideal_bytes_per_cell=ideal,
                sweeps_total=it * updates_per_cell)
