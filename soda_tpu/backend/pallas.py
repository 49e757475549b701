"""Pallas TPU backend: lowers a fused stage group to one `pl.pallas_call`.

TPU-native replacement for the reference's HLS dataflow codegen
(src/soda/codegen/xilinx/hls_kernel.py per SURVEY.md §2.1, reconstructed —
empty reference mount).  Mapping of the reference's microarchitecture:

  reference (FPGA)                     this backend (TPU)
  -----------------------------------  -----------------------------------
  BurstRead/BurstWrite AXI modules     Mosaic grid pipelining: Element-
                                       indexed halo windows auto-DMA'd
                                       HBM->VMEM, double-buffered
  forward modules (FIFO line buffers)  VMEM window halo (block + span)
  compute modules ×unroll_factor       8×128-wide VPU ops (vectorization
                                       subsumes spatial unroll)
  `iterate` pipeline replication       in-kernel fori_loop over fused
                                       sweeps on a constant-extent buffer
  hls::stream inter-stage FIFOs        stage values held in VMEM/registers,
                                       consumers read shifted slices

Hardware rules baked in (verified on v5e): window starts 8-aligned on all
tiled dims (block sizes are multiples of 8); window sizes on the sublane
dim 8-aligned; lane dim never tiled or haloed — lane taps are in-kernel
vector shifts with zero fill (matching the global border convention,
because the lane dim is never split across blocks).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..interp.evaluator import EvalContext, eval_expr, store_cast
from ..ir.program import StencilProgram
from ..plan.planner import GroupPlan, Plan, _round_up, plan as make_plan


def _compute_dtype(program: StencilProgram, name: str):
    return jnp.float32 if program.tensors[name].type.is_float else jnp.int32


def _io_dtype(program: StencilProgram, name: str):
    """HBM storage dtype: narrow ints in 16-bit containers (halves HBM
    traffic vs int32; the reference streams uint16 at 2 B/cell).  `half`
    streams as uint16 IEEE-f16 BIT PATTERNS (Mosaic has no f16 vector
    type on v5e — hardware-probed) decoded/encoded in-kernel."""
    if _is_half(program, name):
        return jnp.uint16
    return program.tensors[name].type.tpu_storage_dtype()


def _to_io(program: StencilProgram, name: str, x) -> jax.Array:
    """Host-side conversion of an input value to its HBM io form."""
    import numpy as np

    if _is_half(program, name):
        if isinstance(x, np.ndarray):
            if x.dtype == np.uint16:
                return jnp.asarray(x)
            return jnp.asarray(np.asarray(x, np.float16).view(np.uint16))
        x = jnp.asarray(x)
        if x.dtype == jnp.uint16:
            return x
        if x.dtype == jnp.float16:
            return jax.lax.bitcast_convert_type(x, jnp.uint16)
        return f16_bits_encode(x.astype(jnp.float32)).astype(jnp.uint16)
    return jnp.asarray(x, _io_dtype(program, name))


def f16_bits_decode(u: jax.Array) -> jax.Array:
    """IEEE f16 bit pattern (uint16/uint32 low half) -> float32, exact for
    normals, subnormals, ±0, ±inf and NaN.  Mosaic on v5e has no f16
    vector type (hardware-probed), so `half` tensors stream as uint16 bit
    patterns (2 B/cell) and decode in-kernel: shift the exponent/mantissa
    into f32 position, rebias, and fix the specials — the subnormal case
    renormalizes via an exact magic-constant subtract."""
    u = u.astype(jnp.uint32)
    sign = (u & jnp.uint32(0x8000)) << jnp.uint32(16)
    em = (u & jnp.uint32(0x7FFF)) << jnp.uint32(13)
    exp = em & jnp.uint32(0x0F800000)  # f16 exponent field, f32 position
    bits = em + jnp.uint32((127 - 15) << 23)
    # inf/nan: add the remaining exponent difference ON TOP of the rebias
    bits = jnp.where(exp == jnp.uint32(0x0F800000),
                     bits + jnp.uint32((128 - 16) << 23), bits)
    # zero/subnormal: renormalize.  The magic is bits (113<<23) as float
    # = 2^-14, written literally: Mosaic rejects SCALAR tpu.bitcast
    # (vector-only — hardware-probed)
    magic = jnp.float32(2.0 ** -14)
    sub = jax.lax.bitcast_convert_type(
        em + jnp.uint32(1 << 23) + jnp.uint32((127 - 15) << 23),
        jnp.float32) - magic
    f = jax.lax.bitcast_convert_type(bits, jnp.float32)
    f = jnp.where(exp == 0, sub, f)
    return jax.lax.bitcast_convert_type(
        sign | jax.lax.bitcast_convert_type(f, jnp.uint32), jnp.float32)


def f16_bits_encode(f: jax.Array) -> jax.Array:
    """float32 -> IEEE f16 bit pattern (uint32 low half), round-to-nearest
    -even, exact incl. subnormals, overflow->inf and NaN (matches numpy's
    f32->f16 cast bit-for-bit — tested)."""
    u = jax.lax.bitcast_convert_type(f.astype(jnp.float32), jnp.uint32)
    sign = u & jnp.uint32(0x80000000)
    u = u ^ sign
    f16max = jnp.uint32((127 + 16) << 23)
    f32infty = jnp.uint32(255 << 23)
    # normal path: rebias with mantissa-odd RNE nudge
    mant_odd = (u >> jnp.uint32(13)) & jnp.uint32(1)
    un = u + jnp.uint32(0xC8000FFF) + mant_odd  # ((15-127)<<23) + 0xfff
    normal = un >> jnp.uint32(13)
    # subnormal path: exact via magic float add.  denorm_magic's float
    # value is 2^(126-127) = 0.5, written literally (no scalar bitcast
    # in Mosaic)
    denorm_magic = jnp.uint32(((127 - 15) + (23 - 10) + 1) << 23)
    fd = jax.lax.bitcast_convert_type(u, jnp.float32) + jnp.float32(0.5)
    subn = jax.lax.bitcast_convert_type(fd, jnp.uint32) - denorm_magic
    out = jnp.where(u < jnp.uint32(113 << 23), subn, normal)
    out = jnp.where(u >= f16max,
                    jnp.where(u > f32infty, jnp.uint32(0x7E00),
                              jnp.uint32(0x7C00)), out)
    return out | (sign >> jnp.uint32(16))


def _is_half(program: StencilProgram, name: str) -> bool:
    t = program.tensors[name].type
    return t.is_float and t.width == 16


def _wide_planes_in(program: StencilProgram, name: str, v):
    """(lo, hi) jnp storage planes for a wide input value: W pair carriers
    unwrap TRACED (the whole wide path is jittable since W became a
    pytree); 64-bit numpy arrays split on the host (legacy entry)."""
    import numpy as np

    from ..interp import wide64

    t = program.tensors[name].type
    if isinstance(v, wide64.W):
        lo, hi = wide64.unwrap_planes(t, v)
        return jnp.asarray(lo), jnp.asarray(hi)
    lo, hi = wide64.split_planes(np.asarray(v).astype(t.np_dtype()))
    return jnp.asarray(lo), jnp.asarray(hi)


def _store_output(program: StencilProgram, name: str, ref, v) -> None:
    """Write one output slab to its kernel ref(s) — the ONE copy of the
    four-way store logic (review r3: per-site copies had drifted).  Wide
    outputs get (lo, hi) plane-pair refs; `half` outputs f16-bit-encode
    (checked BEFORE the wide unwrap: a half output in a wide program must
    encode, not value-cast to uint16); W carriers into a narrow ref cast
    then unwrap; everything else is a plain cast."""
    from ..interp import wide64

    ty = program.tensors[name].type
    if isinstance(ref, tuple):  # wide output: (lo, hi) plane refs
        lo, hi = wide64.unwrap_planes(ty, v.astype(ty.np_dtype()))
        ref[0][:] = lo.astype(ref[0].dtype)
        ref[1][:] = hi.astype(ref[1].dtype)
    elif _is_half(program, name) and ref.dtype == jnp.uint16:
        raw = v.a if isinstance(v, wide64.W) else v
        ref[:] = f16_bits_encode(raw).astype(jnp.uint16)
    elif isinstance(v, wide64.W):
        ref[:] = v.astype(ref.dtype).a
    else:
        ref[:] = v.astype(ref.dtype)


def _to_wide(values: Mapping, type_of) -> dict:
    """Host boundary for wide programs: split 64-bit numpy values into W
    pair carriers of jnp planes (W values pass through; the value coerces
    to the DECLARED dtype first — a float array fed to an int64 tensor
    must value-cast, not bit-reinterpret).  The resulting dict is a valid
    jit argument — W is a pytree."""
    import numpy as np

    from ..interp import wide64

    out = {}
    for n, v in values.items():
        t = type_of(n)
        if t is not None and wide64.is_wide(t) and not isinstance(v, wide64.W):
            lo, hi = wide64.split_planes(np.asarray(v).astype(t.np_dtype()))
            out[n] = wide64.wrap_planes(t, jnp.asarray(lo), jnp.asarray(hi),
                                        jnp)
        else:
            out[n] = v
    return out


def to_wide_values(program: StencilProgram, inputs: Mapping) -> dict:
    return _to_wide(inputs, lambda n: program.tensors[n].type
                    if n in program.tensors else None)


def to_wide_params(program: StencilProgram, params: Mapping) -> dict:
    """64-bit numpy params -> W pair carriers (jnp.asarray would silently
    truncate them to 32 bits)."""
    return _to_wide(params, lambda n: program.params[n].type
                    if n in program.params else None)


def _lane_shift(a: jax.Array, off: int) -> jax.Array:
    """Zero-fill shift along the last dim: out[..., i] = a[..., i+off].

    Implemented as roll + iota mask rather than pad + slice: Mosaic lowers
    lane-dim pads of vectors with offset sublane layouts to an unsupported
    `tpu.concatenate`, while rotate + select is always legal."""
    from ..interp.wide64 import W

    if isinstance(a, W):  # 64-bit pair carrier: shift each plane
        return a.map(lambda p: _lane_shift(p, off))
    if off == 0:
        return a
    n = a.shape[-1]
    rolled = jnp.roll(a, -off, axis=a.ndim - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    valid = (idx < n - off) if off > 0 else (idx >= -off)
    return jnp.where(valid, rolled, jnp.zeros_like(a))


def _shift_all(a: jax.Array, offsets: tuple[int, ...]) -> jax.Array:
    """Zero-fill shift in every dim at constant extent (constant-extent
    taps for fused sweeps and line-buffer slabs).

    roll + iota mask per dim, not pad + slice: Mosaic cannot lower pads of
    values with offset sublane/lane layouts (unsupported tpu.concatenate),
    while rotate + select is always legal."""
    from ..interp.wide64 import W

    if isinstance(a, W):  # pair carrier: shift each plane
        return a.map(lambda p: _shift_all(p, offsets))
    for axis, off in enumerate(offsets):
        if off == 0:
            continue
        n = a.shape[axis]
        a = jnp.roll(a, -off, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
        valid = (idx < n - off) if off > 0 else (idx >= -off)
        a = jnp.where(valid, a, jnp.zeros_like(a))
    return a


def _feedback_live(program: StencilProgram, stages) -> set[str]:
    """Stages needed (transitively) by the FEEDBACK output within a fused
    sweep: in a multi-output iterate group the non-feedback outputs are
    final-sweep-only (the reference's replication lowering leaves the
    intermediate sweeps' copies dead — docs/SEMANTICS.md), so the sweep
    loops skip everything outside this set until the last sweep."""
    from ..ir import expr as ir_expr

    members = set(stages)
    fb = program.output_names[0]
    live: set[str] = set()
    work = [fb] if fb in members else []
    while work:
        s = work.pop()
        if s in live:
            continue
        live.add(s)
        for r in ir_expr.get_load_set(program.tensors[s].expr):
            if r.name in members and r.name not in live:
                work.append(r.name)
    return live if live else set(members)


def _group_params(program: StencilProgram, g: GroupPlan) -> list[str]:
    """Param names referenced by the group's stage expressions."""
    from ..ir import expr as ir_expr

    used: dict[str, None] = {}
    for s in g.stages:
        for n in ir_expr.walk(program.tensors[s].expr):
            if isinstance(n, (ir_expr.ParamRef, ir_expr.Var)):
                used.setdefault(n.name, None)
    return list(used)


def _param_ops(program: StencilProgram, param_names, params) -> list:
    """Params as pallas operands: compute dtypes, >= 2-D shapes.  64-bit
    params ship as two 32-bit planes (lo, hi)."""
    from ..interp import wide64

    import numpy as np

    ops = []
    for name in param_names:
        t = program.params[name].type
        if wide64.is_wide(t):
            v = params[name]
            if isinstance(v, wide64.W):  # traced pair carrier
                lo, hi = wide64.unwrap_planes(t, v)
            else:
                lo, hi = wide64.split_planes(
                    np.asarray(v).astype(t.np_dtype()))
            for plane in (lo, hi):
                q = jnp.asarray(plane)
                if q.ndim < 2:
                    q = q.reshape((1,) * (2 - q.ndim) + q.shape)
                ops.append(q)
            continue
        p = jnp.asarray(params[name])
        p = p.astype(jnp.float32 if t.is_float else jnp.int32)
        if p.ndim < 2:
            p = p.reshape((1,) * (2 - p.ndim) + p.shape)
        ops.append(p)
    return ops


def _n_param_ops(program: StencilProgram, param_names) -> int:
    from ..interp import wide64

    return sum(2 if wide64.is_wide(program.params[n].type) else 1
               for n in param_names)


def _read_params(program: StencilProgram, param_names, par_refs) -> dict:
    from ..interp import wide64

    params = {}
    i = 0
    for name in param_names:
        t = program.params[name].type
        shp = program.params[name].shape
        if wide64.is_wide(t):
            lo = par_refs[i][:]
            hi = par_refs[i + 1][:]
            i += 2
            lo = lo.reshape(shp) if shp else lo.reshape(())
            hi = hi.reshape(shp) if shp else hi.reshape(())
            params[name] = wide64.wrap_planes(t, lo, hi, jnp)
        else:
            v = par_refs[i][:]
            i += 1
            params[name] = v.reshape(shp) if shp else v.reshape(())
    return params


def _eval_group(program: StencilProgram, g: GroupPlan,
                values: dict, params: dict, out_refs) -> None:
    """Shared evaluation core: `values` holds each external input's full
    window (block + halo extent per g.halo); evaluates the group's stages
    and writes the output blocks.  Used by both the windows kernel (windows
    read directly from refs) and the strips kernel (windows assembled from
    clamped halo-strip operands)."""
    rank = program.rank
    block = g.block

    # `half` tensors arrive as uint16 f16 bit patterns: decode once into
    # f32 working values (encode again at the output stores)
    for _n in list(values):
        v = values[_n]
        if _is_half(program, _n) and getattr(v, "dtype", None) == jnp.uint16:
            values[_n] = f16_bits_decode(v)

    def origin(name: str) -> tuple[int, ...]:
        if name in g.halo:  # external input: aligned halo
            return tuple(-g.halo[name][d][0] for d in range(rank - 1))
        sp = g.spans.get(name, tuple((0, 0) for _ in range(rank)))
        return tuple(sp[d][0] for d in range(rank - 1))

    def extent(name: str) -> tuple[int, ...]:
        if name in g.halo:
            return tuple(
                block[d] + g.halo[name][d][0] + g.halo[name][d][1]
                for d in range(rank - 1))
        sp = g.spans.get(name, tuple((0, 0) for _ in range(rank)))
        return tuple(block[d] - sp[d][0] + sp[d][1] for d in range(rank - 1))

    if g.sweeps == 1:
        # exact-extent evaluation: each stage computed once at
        # block+span extent; taps slice the parent's larger extent.
        from ..interp import wide64

        wide = wide64.program_is_wide(program)
        current_consumer: list[str] = [""]

        def tap(parent: str, off: tuple[int, ...]):
            c = current_consumer[0]
            co = origin(c)
            po = origin(parent)
            ce = extent(c)
            pv = values[parent]
            sl = tuple(
                slice(co[d] + off[d] - po[d], co[d] + off[d] - po[d] + ce[d])
                for d in range(rank - 1)
            ) + (slice(None),)
            return _lane_shift(pv[sl], off[-1])

        if wide:
            # 64-bit pair carriers: the shared evaluator walks with the
            # WideXP shim — oracle-width (64-bit) integer semantics and
            # double-single f64 in-kernel (interp/wide64.py)
            ctx = EvalContext(program=program, xp=wide64.WideXP(jnp),
                              tap=tap, params=params, int_width=64,
                              tpu_wide=True)
        else:
            ctx = EvalContext(program=program, xp=jnp, tap=tap,
                              params=params, int_width=32)
        for name in g.stages:
            t = program.tensors[name]
            current_consumer[0] = name
            v, vt = eval_expr(t.expr, ctx)
            values[name] = store_cast(ctx, v, vt, t.type)
        for name, ref in zip(g.outputs, out_refs):
            v = values[name]
            # a group output that is ALSO consumed inside the group is
            # materialized at its extended span; write only the block
            sp = g.spans.get(name, tuple((0, 0) for _ in range(rank)))
            if any(sp[d] != (0, 0) for d in range(rank - 1)):
                center = tuple(
                    slice(-sp[d][0], -sp[d][0] + block[d])
                    for d in range(rank - 1)) + (slice(None),)
                v = v[center]
            _store_output(program, name, ref, v)
    elif g.trapezoid:
        # trapezoid fused sweeps: Python-unrolled with exact SHRINKING
        # extents — sweep s (m = sweeps-1-s remaining) computes only
        # block + m*creep, eliminating the constant-extent margin
        # recompute.  Auxiliary (non-feedback) inputs are sweep-invariant
        # windows tapped like stage values.
        from ..interp import wide64

        wide = wide64.program_is_wide(program)
        fb = (program.input_names[0]
              if program.input_names[0] in g.external_inputs
              else g.external_inputs[0])
        out_name = (program.output_names[0]
                    if program.output_names[0] in g.outputs
                    else g.outputs[0])
        live = _feedback_live(program, g.stages)
        creep = g.sweep_span

        # per-array (origin, per-leading-dim) bookkeeping; origins are
        # relative to the output block, always <= 0
        origins: dict[str, tuple[int, ...]] = {}
        vals: dict[str, jax.Array] = {}
        for name in g.external_inputs:
            h = g.halo[name]
            origins[name] = tuple(-h[d][0] for d in range(rank - 1))
            vals[name] = values[name]
        if not wide:  # pair carriers (W) are already in compute form
            vals[fb] = vals[fb].astype(_compute_dtype(program, fb))

        for s in range(g.sweeps):
            m = g.sweeps - 1 - s
            to = tuple(m * creep[d][0] for d in range(rank - 1))
            te = tuple(block[d] + m * (creep[d][1] - creep[d][0])
                       for d in range(rank - 1))
            stage_o = {}
            stage_e = {}
            for st in g.stages:
                sp = g.spans.get(st, tuple((0, 0) for _ in range(rank)))
                stage_o[st] = tuple(to[d] + sp[d][0]
                                    for d in range(rank - 1))
                stage_e[st] = tuple(te[d] - sp[d][0] + sp[d][1]
                                    for d in range(rank - 1))
            cur_stage = [""]
            sweep_vals: dict[str, jax.Array] = {}

            def tap(parent, off):
                st = cur_stage[0]
                so, se = stage_o[st], stage_e[st]
                # a parent computed THIS sweep shadows last sweep's value
                if parent in sweep_vals:
                    pv, po = sweep_vals[parent], stage_o[parent]
                else:
                    pv, po = vals[parent], origins[parent]
                sl = tuple(
                    slice(so[d] + off[d] - po[d],
                          so[d] + off[d] - po[d] + se[d])
                    for d in range(rank - 1)) + (slice(None),)
                return _lane_shift(pv[sl], off[-1])

            if wide:
                ctx = EvalContext(program=program, xp=wide64.WideXP(jnp),
                                  tap=tap, params=params, int_width=64,
                                  tpu_wide=True)
            else:
                ctx = EvalContext(program=program, xp=jnp, tap=tap,
                                  params=params, int_width=32)
            last = s == g.sweeps - 1
            for st in g.stages:
                if not last and st not in live:
                    continue  # non-feedback-output chains: final sweep only
                cur_stage[0] = st
                t = program.tensors[st]
                v, vt = eval_expr(t.expr, ctx)
                sweep_vals[st] = store_cast(ctx, v, vt, t.type)
            # feed back: the sweep's output becomes next sweep's fb value
            vals[fb] = (sweep_vals[out_name] if wide else
                        sweep_vals[out_name].astype(
                            _compute_dtype(program, fb)))
            origins[fb] = stage_o[out_name]
        # final sweep (m=0) evaluated every stage at block+span extent:
        # store each output's last-sweep value (center-sliced when it is
        # also consumed inside the group and so carries a span)
        for name, ref in zip(g.outputs, out_refs):
            v = sweep_vals[name]
            sp = g.spans.get(name, tuple((0, 0) for _ in range(rank)))
            if any(sp[d] != (0, 0) for d in range(rank - 1)):
                center = tuple(
                    slice(-sp[d][0], -sp[d][0] + block[d])
                    for d in range(rank - 1)) + (slice(None),)
                v = v[center]
            _store_output(program, name, ref, v)
    else:
        # constant-extent fused sweeps: zero-fill taps; invalid values
        # creep one sweep-span inward per sweep, staying inside the halo.
        # (No auxiliary inputs on this path — the planner caps fused
        # sweeps so aux-input programs take the trapezoid path.)
        # Wide programs carry the W pair through the fori_loop (W is a
        # pytree): deep-iterate 64-bit programs fuse beyond the trapezoid
        # cap with exact pair semantics.
        from ..interp import wide64

        wide = wide64.program_is_wide(program)
        in_name = g.external_inputs[0]
        out_name = (program.output_names[0]
                    if program.output_names[0] in g.outputs
                    else g.outputs[0])
        live = _feedback_live(program, g.stages)
        fb_dtype = program.tensors[in_name].type.np_dtype()

        def tap_const(vals, parent, off):
            return _shift_all(vals[parent], off)

        # fori_loop carry dtype/rep must be loop-invariant: widen the
        # storage-dtype input to the compute form up front
        if wide:
            values[in_name] = values[in_name].astype(fb_dtype)
        else:
            values[in_name] = values[in_name].astype(
                _compute_dtype(program, in_name))

        def sweep(a, last: bool) -> dict:
            vals = {in_name: a}
            if wide:
                ctx = EvalContext(program=program, xp=wide64.WideXP(jnp),
                                  tap=lambda p, off: tap_const(vals, p, off),
                                  params=params, int_width=64,
                                  tpu_wide=True)
            else:
                ctx = EvalContext(
                    program=program, xp=jnp,
                    tap=lambda p, off: tap_const(vals, p, off),
                    params=params, int_width=32)
            for name in g.stages:
                if not last and name not in live:
                    continue  # non-feedback outputs: final sweep only
                t = program.tensors[name]
                v, vt = eval_expr(t.expr, ctx)
                vals[name] = store_cast(ctx, v, vt, t.type)
            return vals

        def body(_, a):
            out = sweep(a, last=False)[out_name]
            # keep the carry rep invariant across sweeps
            return out.astype(fb_dtype) if wide else out

        h = g.halo[in_name]
        center = tuple(
            slice(h[d][0], h[d][0] + block[d]) for d in range(rank - 1)
        ) + (slice(None),)
        if len(g.outputs) == 1:
            # single output: all sweeps in the fori, store the carry
            a = jax.lax.fori_loop(0, g.sweeps, body, values[in_name])
            _store_output(program, out_name, out_refs[0], a[center])
        else:
            # multi-output iterate: sweeps-1 in the fori, then ONE final
            # (traced-once) sweep outside it so every output's last-sweep
            # value exists for the stores
            a = jax.lax.fori_loop(0, g.sweeps - 1, body, values[in_name])
            final = sweep(a, last=True)
            for name, ref in zip(g.outputs, out_refs):
                _store_output(program, name, ref, final[name][center])


def _build_kernel(program: StencilProgram, g: GroupPlan):
    """Pallas kernel body for the windows strategy (windows read directly
    from Element-indexed refs over host-padded arrays).  64-bit tensors
    arrive/leave as TWO (lo, hi) plane refs and are evaluated as pair
    carriers (interp/wide64.py)."""
    from ..interp import wide64

    param_names = _group_params(program, g)
    n_par = _n_param_ops(program, param_names)
    in_wide = [wide64.is_wide(program.tensors[n].type)
               for n in g.external_inputs]
    out_wide = [wide64.is_wide(program.tensors[n].type) for n in g.outputs]
    n_in = sum(2 if w else 1 for w in in_wide)

    def kernel(*refs):
        par_refs = refs[n_in:n_in + n_par]
        params = _read_params(program, param_names, par_refs)
        values = {}
        i = 0
        for name, w in zip(g.external_inputs, in_wide):
            if w:
                t = program.tensors[name].type
                values[name] = wide64.wrap_planes(
                    t, refs[i][:], refs[i + 1][:], jnp)
                i += 2
            else:
                values[name] = refs[i][:]
                i += 1
        raw_out = refs[n_in + n_par:]
        out_refs = []
        j = 0
        for w in out_wide:
            if w:
                out_refs.append((raw_out[j], raw_out[j + 1]))
                j += 2
            else:
                out_refs.append(raw_out[j])
                j += 1
        _eval_group(program, g, values, params, out_refs)

    return kernel


def _pad_input(x: jax.Array, halo, block, grid, grid_shape, rank):
    """Host-pad one external input: halo + block round-up (hi side)."""
    pads = []
    for d in range(rank - 1):
        rounded = grid[d] * block[d]
        pads.append((halo[d][0], halo[d][1] + (rounded - grid_shape[d])))
    pads.append((0, 0))
    return jnp.pad(x, pads)


def _build_strips_group_fn(program: StencilProgram, g: GroupPlan,
                           grid_shape: tuple[int, ...],
                           interpret: bool = False):
    """Pad-free windows: each input's (block + halo) window is assembled
    in-kernel from a cross product of clamped Element *strip* operands
    (lo/center/hi per tiled dim — a 3/9-patch), with strips zeroed under
    edge predicates (= the zero-fill border convention) instead of reading
    a host-padded copy.  Eliminates the pad's read+write of the full array
    per kernel call.  Requires grid dims divisible by the block and strip
    sizes aligned to the tile quantum (the planner guarantees both)."""
    import itertools as it

    from ..interp import wide64

    rank = program.rank
    block = g.block
    X = grid_shape[-1]
    n_tiled = rank - 1
    param_names = _group_params(program, g)
    wide_in = {n: wide64.is_wide(program.tensors[n].type)
               for n in g.external_inputs}
    n_par_ops = _n_param_ops(program, param_names)
    # aligned-core hybrid: the kernel's world is the core; rows beyond it
    # are produced by the XLA rim pass (see _apply_rims)
    cshape = g.core or grid_shape

    # piece kinds per tiled dim per input: -1 (lo strip), 0 (center), +1 (hi)
    def kinds_for(name):
        per_dim = []
        for d in range(n_tiled):
            ks = []
            if g.halo[name][d][0] > 0:
                ks.append(-1)
            ks.append(0)
            if g.halo[name][d][1] > 0:
                ks.append(1)
            per_dim.append(ks)
        return list(it.product(*per_dim))

    in_specs = []
    piece_index: list[tuple[str, tuple[int, ...]]] = []
    for name in g.external_inputs:
        h = g.halo[name]
        for kinds in kinds_for(name):
            shape = []
            for d in range(n_tiled):
                shape.append({-1: h[d][0], 0: block[d], 1: h[d][1]}[kinds[d]])
            shape.append(X)

            def imap(*gidx, _kinds=kinds, _h=h):
                out = []
                for d in range(n_tiled):
                    B = block[d]
                    D = cshape[d]
                    # center clamps so the last (possibly partial) block
                    # overlaps its predecessor: overlapping recompute is
                    # idempotent, so D need only be tile-quantum aligned
                    center = jnp.minimum(gidx[d] * B, D - B)
                    if _kinds[d] == 0:
                        out.append(pl.multiple_of(center, 8))
                    elif _kinds[d] == -1:
                        out.append(pl.multiple_of(
                            jnp.maximum(center - _h[d][0], 0), 8))
                    else:
                        out.append(pl.multiple_of(
                            jnp.minimum(center + B, D - _h[d][1]), 8))
                out.append(0)
                return tuple(out)

            for plane in range(2 if wide_in[name] else 1):
                in_specs.append(pl.BlockSpec(
                    tuple(pl.Element(s) for s in shape), imap,
                    memory_space=pltpu.VMEM))
                piece_index.append((name, kinds, plane))

    for _ in range(n_par_ops):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    def out_imap(*gidx):
        return tuple(
            pl.multiple_of(
                jnp.minimum(gidx[d] * block[d], cshape[d] - block[d]), 8)
            for d in range(n_tiled)) + (0,)

    out_specs = []
    out_shapes = []
    out_wide = []
    for o in g.outputs:
        w = wide64.is_wide(program.tensors[o].type)
        out_wide.append(w)
        t = program.tensors[o].type
        plane_dt = jnp.float32 if t.is_float else jnp.uint32
        for _ in range(2 if w else 1):
            out_specs.append(pl.BlockSpec(
                tuple(pl.Element(b) for b in block[:n_tiled])
                + (pl.Element(X),), out_imap, memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(
                tuple(grid_shape[:n_tiled]) + (X,),
                plane_dt if w else _io_dtype(program, o)))

    n_pieces = len(piece_index)

    def kernel(*refs):
        piece_refs = refs[:n_pieces]
        par_refs = refs[n_pieces:n_pieces + n_par_ops]
        raw_out = refs[n_pieces + n_par_ops:]
        out_refs = []
        j = 0
        for w in out_wide:
            if w:
                out_refs.append((raw_out[j], raw_out[j + 1]))
                j += 2
            else:
                out_refs.append(raw_out[j])
                j += 1
        params = _read_params(program, param_names, par_refs)

        gidx = [pl.program_id(d) for d in range(n_tiled)]
        gnum = [pl.num_programs(d) for d in range(n_tiled)]

        pieces: dict = {}
        for (name, kinds, plane), ref in zip(piece_index, piece_refs):
            v = ref[:]
            # zero edge strips: a lo strip at grid index 0 (or hi strip at
            # the last index) holds clamped re-reads — semantically the
            # region is outside the grid, i.e. zero
            zero = None
            for d in range(n_tiled):
                if kinds[d] == -1:
                    c = gidx[d] == 0
                elif kinds[d] == 1:
                    c = gidx[d] == gnum[d] - 1
                else:
                    continue
                zero = c if zero is None else (zero | c)
            if zero is not None:
                v = jnp.where(zero, jnp.zeros_like(v), v)
            pieces.setdefault((name, plane), {})[kinds] = v

        # assemble: concat along dims from last tiled dim to first
        def assemble(ps, prefix: tuple[int, ...], d: int):
            if d == n_tiled:
                return ps[prefix]
            parts = []
            for k in (-1, 0, 1):
                if any(kk[:d] == prefix and kk[d] == k for kk in ps):
                    parts.append(assemble(ps, prefix + (k,), d + 1))
            return jnp.concatenate(parts, axis=d) if len(parts) > 1 \
                else parts[0]

        values = {}
        for name in g.external_inputs:
            if wide_in[name]:
                p0 = assemble(pieces[(name, 0)], (), 0)
                p1 = assemble(pieces[(name, 1)], (), 0)
                values[name] = wide64.wrap_planes(
                    program.tensors[name].type, p0, p1, jnp)
            else:
                values[name] = assemble(pieces[(name, 0)], (), 0)

        _eval_group(program, g, values, params, out_refs)

    call = pl.pallas_call(
        kernel,
        grid=g.grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else tuple(out_specs),
        out_shape=out_shapes[0] if len(out_shapes) == 1 else tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(g.grid),
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )

    def fn(values: Mapping[str, jax.Array], params: Mapping[str, jax.Array]):
        ops = []
        for name in g.external_inputs:
            if wide_in[name]:
                planes = _wide_planes_in(program, name, values[name])
                for _ in kinds_for(name):
                    ops.extend(planes)
            else:
                x = _to_io(program, name, values[name])
                ops.extend([x] * len(kinds_for(name)))
        ops.extend(_param_ops(program, param_names, params))
        outs = call(*ops)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        res = {}
        j = 0
        for name, w in zip(g.outputs, out_wide):
            if w:
                # traced W pair carriers out (merged at the run() boundary)
                res[name] = wide64.wrap_planes(
                    program.tensors[name].type, outs[j], outs[j + 1], jnp)
                j += 2
            else:
                res[name] = outs[j]
                j += 1
        return res

    return fn


def _eval_group_slab(program: StencilProgram, g: GroupPlan,
                     ins: Mapping[str, jax.Array], params) -> dict:
    """Evaluate a group's stages on a full slab with zero-fill taps (the
    plain-XLA equivalent of the kernel's constant-extent evaluation) —
    used for the ragged-rim pass of the aligned-core hybrid.

    Taps use the XLA backend's pad+slice shift, NOT roll: jnp.roll lowers
    to width-1 lane slices whose layout preference makes XLA pick a
    transposed entry layout and wrap the main custom call in full
    transposing copies (verified on v5e)."""
    from ..interp import wide64
    from .xla import shifted_jnp

    wide = wide64.program_is_wide(program)

    def _tapv(vals, p, off):
        v = vals[p]
        if not isinstance(v, wide64.W):
            v = jnp.asarray(v)
        return shifted_jnp(v, off)

    def _ctx(params):
        if wide:
            return EvalContext(program=program, xp=wide64.WideXP(jnp),
                               tap=None, params=params, int_width=64,
                               tpu_wide=True)
        return EvalContext(program=program, xp=jnp, tap=None,
                           params=params, int_width=32)

    if g.sweeps == 1:
        vals = dict(ins)
        ctx = _ctx(params)
        ctx.tap = lambda p, off: _tapv(vals, p, off)
        for name in g.stages:
            t = program.tensors[name]
            v, vt = eval_expr(t.expr, ctx)
            vals[name] = store_cast(ctx, v, vt, t.type)
        return {n: vals[n] for n in g.outputs}
    fb = (program.input_names[0] if program.input_names[0] in ins
          else g.external_inputs[0])
    out_name = (program.output_names[0]
                if program.output_names[0] in g.outputs else g.outputs[0])
    live = _feedback_live(program, g.stages)
    fb_dtype = program.tensors[fb].type.np_dtype()
    if wide:
        # pair carriers ride the fori carry as a W pytree; the rep is
        # normalized to the feedback dtype so the carry stays invariant
        a = ins[fb].astype(fb_dtype)
    else:
        a = jnp.asarray(ins[fb]).astype(_compute_dtype(program, fb))
    # auxiliary (non-feedback) inputs are sweep-invariant: close over them
    # rather than threading them through the fori carry
    aux = {n: (v if isinstance(v, wide64.W) else jnp.asarray(v))
           for n, v in ins.items() if n != fb}

    def sweep(a, last: bool) -> dict:
        vals = dict(aux)
        vals[fb] = a
        ctx = _ctx(params)
        ctx.tap = lambda p, off: _tapv(vals, p, off)
        for name in g.stages:
            if not last and name not in live:
                continue  # non-feedback outputs: final sweep only
            t = program.tensors[name]
            v, vt = eval_expr(t.expr, ctx)
            vals[name] = store_cast(ctx, v, vt, t.type)
        return vals

    def body(_, a):
        out = sweep(a, last=False)[out_name]
        return out.astype(fb_dtype) if wide else out.astype(a.dtype)

    if len(g.outputs) == 1:
        return {out_name: jax.lax.fori_loop(0, g.sweeps, body, a)}
    # multi-output iterate: final sweep outside the fori (see _eval_group)
    a = jax.lax.fori_loop(0, g.sweeps - 1, body, a)
    final = sweep(a, last=True)
    return {n: final[n] for n in g.outputs}


def _apply_rims(program: StencilProgram, g: GroupPlan,
                grid_shape: tuple[int, ...], values, params, outs) -> dict:
    """Ragged-rim pass of the aligned-core hybrid: for each leading dim
    whose extent is not tile-quantum aligned, the kernel ran on the
    rounded-down core and zero-filled taps at the core's hi edge; recompute
    everything within that creep from a thin input slab (XLA evaluation,
    unaligned extents are fine there) and stitch it in with an in-place
    dynamic-update-slice."""
    rank = program.rank
    nf = g.sweeps
    outs = dict(outs)
    # rim slabs evaluate at CONSTANT extent (_eval_group_slab): margins
    # use the non-cancelling chain creep x sweeps, not the composed span
    creep1 = program.chain_creep(g.stages, g.outputs)
    for d in range(rank - 1):
        if g.core[d] == grid_shape[d]:
            continue
        hi = nf * creep1[d][1]
        lo = nf * -creep1[d][0]
        keep_lo = g.core[d] - hi       # first invalid-or-unwritten row
        in_lo = max(keep_lo - lo, 0)   # slab start: taps of kept rows
        # keep the slab's extent a sublane multiple: XLA's layout
        # assignment otherwise prefers a transposed entry layout for the
        # skinny slab ops and inserts full transposing copies around the
        # main kernel's custom call (verified on v5e)
        in_lo = min(in_lo,
                    max(grid_shape[d] - _round_up(grid_shape[d] - in_lo, 8),
                        0))
        from ..interp import wide64

        def _val(n):
            t = program.tensors[n].type
            if wide64.is_wide(t):
                v = values[n]
                if isinstance(v, wide64.W):
                    return v  # already a (traced) pair carrier
                lo, hi = _wide_planes_in(program, n, v)
                return wide64.wrap_planes(t, lo, hi, jnp)
            x = jnp.asarray(values[n])
            if _is_half(program, n) and x.dtype == jnp.uint16:
                x = f16_bits_decode(x)  # chained-group half io is f16 bits
            return x

        def _slice(x, start, stop):
            return wide64.slice_dim(x, start, stop, d)

        slab_ins = {
            n: _slice(_val(n), in_lo, grid_shape[d])
            for n in g.external_inputs
        }
        slab_outs = _eval_group_slab(program, g, slab_ins, params)
        for n in g.outputs:
            v = slab_outs[n]
            rim = _slice(v, keep_lo - in_lo, v.shape[d])
            start = [0] * rank
            start[d] = keep_lo
            if isinstance(rim, wide64.W):
                # wide outputs are TRACED W pair carriers: stitch each
                # plane in place with a dynamic-update-slice
                t = program.tensors[n].type
                rim_lo, rim_hi = wide64.unwrap_planes(
                    t, rim.astype(t.np_dtype()))
                out_lo, out_hi = wide64.unwrap_planes(t, outs[n])
                st = tuple(start)
                new_lo = jax.lax.dynamic_update_slice(
                    jnp.asarray(out_lo),
                    jnp.asarray(rim_lo).astype(out_lo.dtype), st)
                new_hi = jax.lax.dynamic_update_slice(
                    jnp.asarray(out_hi),
                    jnp.asarray(rim_hi).astype(out_hi.dtype), st)
                outs[n] = wide64.wrap_planes(t, new_lo, new_hi, jnp)
                continue
            if _is_half(program, n) and outs[n].dtype == jnp.uint16:
                rim = f16_bits_encode(rim).astype(jnp.uint16)
            else:
                rim = rim.astype(outs[n].dtype)
            outs[n] = jax.lax.dynamic_update_slice(
                outs[n], rim, tuple(start))
    return outs


def build_group_fn(program: StencilProgram, g: GroupPlan,
                   grid_shape: tuple[int, ...], interpret: bool = False):
    """fn(values: dict, params: dict) -> dict for one fused group call."""
    if g.strategy in ("linebuffer", "strips"):
        if g.strategy == "linebuffer":
            from ._linebuffer import build_linebuffer_group_fn
            base = build_linebuffer_group_fn(program, g, grid_shape, interpret)
        else:
            base = _build_strips_group_fn(program, g, grid_shape, interpret)
        if g.core is None:
            return base

        def fn_hybrid(values: Mapping[str, jax.Array],
                      params: Mapping[str, jax.Array]):
            outs = base(values, params)
            return _apply_rims(program, g, grid_shape, values, params, outs)

        return fn_hybrid
    from ..interp import wide64

    rank = program.rank
    block = g.block
    X = grid_shape[-1]
    kernel = _build_kernel(program, g)

    from ._linebuffer import _plane_dtype

    in_specs = []
    for name in g.external_inputs:
        h = g.halo[name]
        win = tuple(block[d] + h[d][0] + h[d][1] for d in range(rank - 1)) + (X,)
        bdims = tuple(pl.Element(w) for w in win)

        def imap(*gidx, _name=name):
            return tuple(gidx[d] * block[d] for d in range(rank - 1)) + (0,)

        spec = pl.BlockSpec(bdims, imap, memory_space=pltpu.VMEM)
        in_specs.append(spec)
        if wide64.is_wide(program.tensors[name].type):
            in_specs.append(pl.BlockSpec(bdims, imap,
                                         memory_space=pltpu.VMEM))

    group_param_names = _group_params(program, g)
    for _ in range(_n_param_ops(program, group_param_names)):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out_block = tuple(block[: rank - 1]) + (X,)

    def out_imap(*gidx):
        return tuple(gidx) + (0,)

    rounded = tuple(g.grid[d] * block[d] for d in range(rank - 1)) + (X,)
    out_specs = []
    out_shapes = []
    out_wide = []
    for o in g.outputs:
        w = wide64.is_wide(program.tensors[o].type)
        out_wide.append(w)
        n_planes = 2 if w else 1
        for _ in range(n_planes):
            out_specs.append(pl.BlockSpec(out_block, out_imap,
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(
                rounded,
                _plane_dtype(program, o) if w else _io_dtype(program, o)))

    call = pl.pallas_call(
        kernel,
        grid=g.grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if len(out_specs) == 1 else tuple(out_specs),
        out_shape=out_shapes[0] if len(out_shapes) == 1 else tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(g.grid),
            # v5e physical VMEM is 128 MiB (probed empirically; the plan's
            # own budget is the real constraint — lift Mosaic's default cap)
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )

    def fn(values: Mapping[str, jax.Array], params: Mapping[str, jax.Array]):
        ops = []
        for name in g.external_inputs:
            t = program.tensors[name].type
            if wide64.is_wide(t):
                # two 32-bit planes per wide tensor: W carriers unwrap
                # traced, numpy 64-bit values split on the host (the value
                # coerces to the DECLARED dtype first: a float array fed
                # to an int64 tensor must value-cast, not bit-reinterpret)
                for plane in _wide_planes_in(program, name, values[name]):
                    ops.append(_pad_input(plane, g.halo[name],
                                          block, g.grid, grid_shape, rank))
            else:
                x = _to_io(program, name, values[name])
                ops.append(_pad_input(x, g.halo[name], block, g.grid,
                                      grid_shape, rank))
        ops.extend(_param_ops(program, group_param_names, params))
        outs = call(*ops)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        res = {}
        sl = tuple(slice(0, grid_shape[d]) for d in range(rank - 1)) \
            + (slice(None),)
        j = 0
        for name, w in zip(g.outputs, out_wide):
            if w:
                # wide outputs stay TRACED as W pair carriers; the run()
                # boundary (finalize_outputs) merges planes on the host
                res[name] = wide64.wrap_planes(
                    program.tensors[name].type,
                    outs[j][sl], outs[j + 1][sl], jnp)
                j += 2
            else:
                res[name] = outs[j][sl]
                j += 1
        return res

    return fn


def _resolve_interpret(interpret) -> bool:
    """interpret='auto' -> True off-TPU (CPU/GPU run the Mosaic interpreter),
    False on TPU."""
    if interpret == "auto":
        return jax.default_backend() not in ("tpu",)
    return bool(interpret)


def _lift_rank1(program: StencilProgram) -> StencilProgram:
    """Lift a rank-1 program to rank 2 with a unit leading dim: Mosaic has
    no 1-D vector layouts, so 1-D programs run as (1, X) 2-D arrays whose
    taps are all lane shifts."""
    from ..ir import expr as ir_expr
    from ..ir.program import Tensor

    def lift_expr(e):
        if e is None:
            return None
        return ir_expr.mutate(
            e, lambda n: ir_expr.Ref(n.name, (0,) + n.offsets)
            if isinstance(n, ir_expr.Ref) else None)

    tensors = {
        n: Tensor(t.name, t.type, lift_expr(t.expr), t.dram,
                  None if t.tile_size is None else (1,) + tuple(t.tile_size),
                  t.is_output, synthetic=t.synthetic)
        for n, t in program.tensors.items()
    }
    return StencilProgram(
        name=program.name, tensors=tensors, params=program.params,
        rank=2, burst_width=program.burst_width, iterate=program.iterate,
        unroll_factor=program.unroll_factor, border=program.border,
        cluster=program.cluster)


def build_fn(program: StencilProgram, the_plan: Plan | None = None,
             grid_shape: tuple[int, ...] | None = None,
             interpret: bool | str = "auto", iterate: int | None = None,
             jit_per_group: bool | str = False, **plan_kwargs):
    """Build a jittable fn(inputs, params) -> outputs for the full program
    (all groups, all temporal chunks) on a fixed grid shape.

    jit_per_group: "auto" jits each chained group SEPARATELY when running
    interpret-mode with multiple groups (the returned fn then carries
    `inner_jitted=True` and must NOT be wrapped in an outer jax.jit).
    Workaround for an XLA:CPU executable-size execution pathology
    (measured this round: a ~25k-eqn interpret executable runs in 0.1 s,
    ~29k eqns takes >9 min at full CPU — value-independent; each group
    alone is fine).  The TPU path keeps single-jit chaining."""
    interpret = _resolve_interpret(interpret)
    check_tpu_supported(program)
    if program.rank == 1:
        base = tuple(grid_shape or (the_plan.grid_shape if the_plan else ()))
        if not base:
            raise ValueError("need grid_shape or a Plan")
        inner = build_fn(_lift_rank1(program), None, (1,) + base,
                         interpret=interpret, iterate=iterate,
                         jit_per_group=jit_per_group, **plan_kwargs)

        from ..interp import wide64
        from ..interp.wide64 import program_is_wide

        if program_is_wide(program):
            import numpy as np

            def _lift0(v):
                if isinstance(v, wide64.W):
                    return v.map(lambda x: x[None, :])
                if isinstance(v, np.ndarray):
                    # host numpy (possibly 64-bit) stays numpy — the
                    # group fn splits planes itself
                    return v[None, :]
                # traced jnp value (the end-to-end wide jit): indexing a
                # tracer is fine; np.asarray would raise
                return jnp.asarray(v)[None, :]

            def fn1w(inputs, params):
                ins2 = {k: _lift0(v) for k, v in inputs.items()}
                # v[0] maps over W pair carriers (W.__getitem__)
                return {k: v[0] for k, v in inner(ins2, params).items()}

            fn1w.inner_jitted = getattr(inner, "inner_jitted", False)
            return fn1w

        def fn1(inputs: Mapping[str, jax.Array],
                params: Mapping[str, jax.Array]):
            ins2 = {k: jnp.asarray(v)[None, :] for k, v in inputs.items()}
            return {k: v[0] for k, v in inner(ins2, params).items()}

        fn1.inner_jitted = getattr(inner, "inner_jitted", False)
        return fn1
    it = max(program.iterate if iterate is None else iterate, 1)
    if the_plan is None:
        if grid_shape is None:
            raise ValueError("need grid_shape or a Plan")
        # the planner snaps fused sweeps to a divisor of the EFFECTIVE
        # iterate (auto-selection included); callers may pass `sweeps`
        # through plan_kwargs to request a kernel depth
        the_plan = make_plan(program, grid_shape, iterate=iterate,
                             **plan_kwargs)
    grid_shape = the_plan.grid_shape
    if len(the_plan.groups) == 1 and it % the_plan.groups[0].sweeps != 0:
        # a caller-provided plan whose kernel depth does not divide the
        # executed sweep count would silently under-execute in the chunk
        # loop below — refuse (review r5)
        raise ValueError(
            f"plan fuses {the_plan.groups[0].sweeps} sweeps per call, "
            f"which does not divide the executed iterate {it}; re-plan "
            f"with iterate={it} (plan(iterate=...)) or pick a divisor")
    group_fns = [
        build_group_fn(program, g, grid_shape, interpret=interpret)
        for g in the_plan.groups
    ]
    if jit_per_group == "auto":
        jit_per_group = interpret and len(the_plan.groups) > 1
    if jit_per_group:
        group_fns = [jax.jit(gf) for gf in group_fns]
    chunks = max(it // the_plan.groups[0].sweeps, 1) \
        if len(the_plan.groups) == 1 else 1
    in_name = program.input_names[0]
    out_name = program.output_names[0]

    def fn(inputs: Mapping[str, jax.Array], params: Mapping[str, jax.Array]):
        values = dict(inputs)
        for g, gfn in zip(the_plan.groups, group_fns):
            values.update(gfn(values, params))
        outs = {n: values[n] for n in program.output_names}
        for _ in range(chunks - 1):
            # feedback: output -> first input; auxiliary inputs carry over
            values = {n: inputs[n] for n in program.input_names}
            values[in_name] = outs[out_name]
            for g, gfn in zip(the_plan.groups, group_fns):
                values.update(gfn(values, params))
            outs = {n: values[n] for n in program.output_names}
        return outs

    fn.inner_jitted = bool(jit_per_group)
    return fn


def check_tpu_supported(program: StencilProgram) -> None:
    """USER-declared 64-bit tensors AND params run in-kernel via
    paired-32-bit carriers (interp/wide64.py — exact s64/u64 incl. long
    division, ~1e-13 double-single f64).  Integers ABOVE 64 bits run on
    the NumPy-oracle and XLA backends as quad-limb carriers
    (interp/wide128.py); the Pallas kernel path would need 4-plane
    carriers — rejected loudly here."""
    from ..interp.wide128 import program_is_128

    if program_is_128(program):
        wide = [f"{n}:{t.type}" for n, t in program.tensors.items()
                if t.type.is_int and t.type.width > 64]
        wide += [f"{p.name}:{p.type}" for p in program.params.values()
                 if p.type.is_int and p.type.width > 64]
        raise NotImplementedError(
            f"program {program.name!r} uses >64-bit integers "
            f"({', '.join(wide)}): the Pallas kernel path supports up to "
            f"64-bit pair carriers; run with `--backend xla` (quad-limb "
            f"carriers, exact) or the NumPy oracle")


def finalize_outputs(program: StencilProgram, outs) -> dict:
    """Convert backend outputs to declared storage dtypes with narrow-
    width mask + sign extension (shared by pallas/xla/mesh run paths)."""
    import numpy as np

    from ..interp import wide64

    res = {}
    for n, v in outs.items():
        t = program.tensors[n].type
        if isinstance(v, wide64.W):
            # wide outputs arrive as traced pair carriers: merge the two
            # 32-bit planes into the declared 64-bit dtype on the host
            lo, hi = wide64.unwrap_planes(t, v.astype(t.np_dtype()))
            res[n] = wide64.merge_planes(np.asarray(lo), np.asarray(hi),
                                         t.np_dtype())
            continue
        a = np.asarray(v)
        if t.is_float and t.width == 16 and a.dtype == np.uint16:
            # Pallas half io: uint16 IEEE-f16 bit patterns
            res[n] = a.view(np.float16)
            continue
        if t.is_int and t.needs_mask:
            a = a & ((1 << t.width) - 1)
            if t.kind == "int":
                sign = 1 << (t.width - 1)
                a = (a ^ sign) - sign
        res[n] = a.astype(t.np_dtype())
    return res


def _check_io(program, inputs, params):
    missing = [n for n in program.input_names if n not in inputs]
    if missing:
        raise ValueError(
            f"missing input tensor(s) {missing}; program {program.name!r} "
            f"expects inputs {program.input_names}")
    missing_p = [n for n in program.params if n not in params]
    if missing_p:
        raise ValueError(
            f"missing param(s) {missing_p}; program {program.name!r} "
            f"declares params {list(program.params)}")


def run(program: StencilProgram, inputs, params=None, *,
        grid_shape=None, interpret="auto", iterate=None, jit=True,
        the_plan=None, **kw):
    """Execute via Pallas; returns numpy outputs in declared dtypes."""
    import numpy as np

    params = dict(params or {})
    _check_io(program, inputs, params)
    if grid_shape is None:
        grid_shape = tuple(np.asarray(next(iter(inputs.values()))).shape)
    fn = build_fn(program, the_plan=the_plan, grid_shape=grid_shape,
                  interpret=interpret, iterate=iterate,
                  jit_per_group="auto", **kw)
    from ..interp.wide64 import program_is_wide

    # inner_jitted: chained groups already carry their own per-group jit
    # (interpret-mode XLA:CPU workaround, see build_fn) — wrapping the
    # chain in an outer jit would rebuild the one-big-executable problem
    outer_jit = jit and not getattr(fn, "inner_jitted", False)
    if program_is_wide(program):
        # wide programs are JITTABLE end-to-end: 64-bit inputs/params
        # split once into W pair carriers (a pytree of two 32-bit jnp
        # planes) at this boundary, the whole chunk/group chain traces,
        # and finalize_outputs merges the output planes on the host
        wins = to_wide_values(program, inputs)
        wpars = to_wide_params(program, params)
        if outer_jit:
            fn = jax.jit(fn)
        outs = fn(wins, wpars)
    else:
        if outer_jit:
            fn = jax.jit(fn)
        outs = fn({k: jnp.asarray(v) for k, v in inputs.items()}, params)
    return finalize_outputs(program, outs)
