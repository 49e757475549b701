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
from typing import Mapping

from ..ir.program import StencilProgram

Span = tuple[tuple[int, int], ...]  # per-dim (lo, hi), lo <= 0 <= hi


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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
    hbm_bytes_per_call: int              # analytic traffic (incl. halo re-reads)
    useful_cells_per_call: int
    compute_extent_ratio: float          # VPU overwork vs useful cells

    def describe(self) -> str:
        eff = self.useful_cells_per_call * 8 / max(self.hbm_bytes_per_call, 1)
        return (
            f"group(stages={self.stages}, sweeps={self.sweeps}, block={self.block}, "
            f"grid={self.grid}, vmem={self.vmem_bytes/2**20:.2f}MiB, "
            f"traffic={self.hbm_bytes_per_call/max(self.useful_cells_per_call,1):.2f}B/cell-update, "
            f"compute_waste={self.compute_extent_ratio:.2f}x, roofline_frac={min(eff,99):.2f})"
        )


@dataclasses.dataclass
class Plan:
    program_name: str
    rank: int
    groups: list[GroupPlan]              # executed in order, chained through HBM
    grid_shape: tuple[int, ...]          # full problem extent this plan was built for
    notes: list[str]

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
                }
                for g in self.groups
            ],
            "notes": self.notes,
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
            continue  # dead stage within group (shouldn't happen)
        t = program.tensors[name]
        for parent, offs in t.window().items():
            lo = [0] * rank
            hi = [0] * rank
            base = spans.get(parent, tuple((0, 0) for _ in range(rank)))
            lo = [b[0] for b in base]
            hi = [b[1] for b in base]
            for off in offs:
                for d in range(rank):
                    lo[d] = min(lo[d], s[d][0] + off[d])
                    hi[d] = max(hi[d], s[d][1] + off[d])
            spans[parent] = tuple(zip(lo, hi))
    return spans


def _align_halo(span: Span, sweeps: int, sweep_span: Span, rank: int
                ) -> tuple[tuple[int, int], ...]:
    """Host-pad amounts per dim for an external input.

    Total halo = one-sweep span + (sweeps-1) × per-sweep creep.  Alignment:
    leading dims exact; sublane dim (rank-2) rounded up to 8 per side; lane
    dim (rank-1) ZERO (lane taps are in-kernel shifts, never window halo).
    """
    out = []
    for d in range(rank):
        lo = -span[d][0] + (sweeps - 1) * -sweep_span[d][0]
        hi = span[d][1] + (sweeps - 1) * sweep_span[d][1]
        if d == rank - 1:
            out.append((0, 0))
        elif d == rank - 2:
            out.append((_round_up(lo, 8), _round_up(hi, 8)))
        else:
            out.append((lo, hi))
    return tuple(out)


def plan(
    program: StencilProgram,
    grid_shape: tuple[int, ...],
    *,
    vmem_budget: int = 64 * 2**20,
    max_compute_waste: float = 3.0,
    sweeps: int | None = None,
    block_override: tuple[int, ...] | None = None,
) -> Plan:
    """Build an execution plan for `program` on a full grid of `grid_shape`.

    Round-1 fusion policy: fuse ALL stages into one group when the combined
    halo fits the VMEM budget (the corpus always does); temporal sweeps are
    fully fused unless the halo would eat more than `max_compute_waste` of
    the block, in which case sweeps are chunked and the kernel is invoked
    iterate/chunk times (SODA's planner heuristic for iterate halo blowup,
    SURVEY.md §7 'hard parts')."""
    if len(grid_shape) != program.rank:
        raise ValueError(f"grid rank {len(grid_shape)} != program rank {program.rank}")
    rank = program.rank
    notes: list[str] = []

    stages = program.stage_order()
    outputs = program.output_names
    ext_inputs = program.input_names
    it = max(program.iterate, 1)

    spans = group_spans(program, stages, outputs)
    out_span = program.cumulative_span(outputs[0])
    for o in outputs[1:]:
        s2 = program.cumulative_span(o)
        out_span = tuple(
            (min(a[0], b[0]), max(a[1], b[1])) for a, b in zip(out_span, s2))

    # -- choose fused sweep count ------------------------------------------
    want_sweeps = it if sweeps is None else sweeps
    nf = want_sweeps

    def halo_for(nf: int) -> dict[str, tuple[tuple[int, int], ...]]:
        return {
            i: _align_halo(spans.get(i, tuple((0, 0) for _ in range(rank))),
                           nf, out_span, rank)
            for i in ext_inputs
        }

    # -- block search -------------------------------------------------------
    dtype_bytes = 4  # f32 / int32 compute path

    def candidates():
        if block_override is not None:
            yield tuple(block_override)
            return
        if rank == 2:
            for bh in (256, 192, 128, 96, 64, 48, 32, 24, 16, 8):
                yield (bh, grid_shape[1])
        elif rank == 3:
            for bz in (64, 48, 32, 24, 16, 8):
                for by in (256, 192, 128, 96, 64, 48, 32, 16, 8):
                    yield (bz, by, grid_shape[2])
        else:
            raise ValueError(f"rank {rank} not supported by the planner (2D/3D only)")

    def evaluate(block, nf):
        halo = halo_for(nf)
        # padded problem dims (tiled dims rounded up to block)
        padded = []
        grid = []
        for d in range(rank - 1):
            g = _round_up(grid_shape[d], block[d]) // block[d]
            grid.append(g)
            padded.append(g * block[d])
        padded.append(grid_shape[-1])
        # VMEM: input windows + out blocks double-buffered; stage intermediates once
        win_bytes = 0
        for i in ext_inputs:
            w = 1
            for d in range(rank):
                w *= block[d] + halo[i][d][0] + halo[i][d][1]
            win_bytes += w * dtype_bytes
        out_bytes = len(outputs) * math.prod(block) * dtype_bytes
        # intermediates: non-output stage tensors materialize once at
        # (block+span) extent (they are kernel-local values, not pipeline
        # buffers — only windows/outputs are double-buffered by Mosaic)
        inter = 0
        for s in stages:
            if s in outputs:
                continue
            sp = spans.get(s, tuple((0, 0) for _ in range(rank)))
            e = 1
            for d in range(rank):
                lo = -sp[d][0] + (nf - 1) * -out_span[d][0]
                hi = sp[d][1] + (nf - 1) * out_span[d][1]
                e *= block[d] + lo + hi
            inter += e * dtype_bytes
        vmem = 2 * (win_bytes + out_bytes) + inter
        # analytic HBM traffic for one kernel call (nf sweeps)
        ncalls_blocks = math.prod(grid)
        reads = win_bytes * ncalls_blocks
        writes = out_bytes * ncalls_blocks
        useful = math.prod(grid_shape) * nf * max(len(outputs), 1)
        # compute waste: largest constant-extent sweep buffer vs block
        max_ext = 1
        for d in range(rank):
            i0 = ext_inputs[0]
            max_ext *= block[d] + halo[i0][d][0] + halo[i0][d][1]
        waste = max_ext / math.prod(block)
        return dict(halo=halo, grid=tuple(grid), vmem=vmem,
                    traffic=reads + writes, useful=useful, waste=waste,
                    padded=tuple(padded))

    best = None
    while True:
        for block in candidates():
            if any(block[d] > _round_up(grid_shape[d], 8) for d in range(rank - 1)):
                continue
            ev = evaluate(block, nf)
            if ev["vmem"] > vmem_budget:
                continue
            if ev["waste"] > max_compute_waste and nf > 1:
                continue
            bpc = ev["traffic"] / ev["useful"]
            key = (bpc, -math.prod(block))
            if best is None or key < best[0]:
                best = (key, block, ev)
        if best is not None:
            break
        if nf > 1:
            nf = max(1, nf // 2)
            notes.append(f"halo blowup: reduced fused sweeps to {nf}")
            continue
        raise ValueError(
            f"no feasible block for grid {grid_shape} under vmem budget "
            f"{vmem_budget} (program {program.name})")

    _, block, ev = best
    if nf < it:
        if it % nf != 0:
            # fall back to largest divisor of it not exceeding nf
            d = nf
            while it % d != 0:
                d -= 1
            nf = d
            ev = evaluate(block, nf)
            notes.append(f"adjusted fused sweeps to divisor {nf} of iterate {it}")

    group = GroupPlan(
        stages=stages,
        external_inputs=ext_inputs,
        outputs=outputs,
        spans=spans,
        sweeps=nf,
        sweep_span=out_span,
        block=block,
        grid=ev["grid"],
        halo=ev["halo"],
        vmem_bytes=ev["vmem"],
        hbm_bytes_per_call=ev["traffic"],
        useful_cells_per_call=ev["useful"],
        compute_extent_ratio=ev["waste"],
    )
    notes.append(
        f"iterate={it} executed as {it // nf} kernel call(s) × {nf} fused sweeps")
    return Plan(
        program_name=program.name,
        rank=rank,
        groups=[group],
        grid_shape=tuple(grid_shape),
        notes=notes,
    )
