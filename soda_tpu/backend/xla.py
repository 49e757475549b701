"""Pure-XLA (jnp) backend: full-grid stencil execution.

This is the portable execution path — it runs on CPU/GPU/TPU, underpins the
sharded per-device local compute in parallel/mesh.py, and cross-checks the
Pallas backend.  XLA's fusion handles producer/consumer stage fusion here;
the Pallas backend (backend/pallas.py) exists to control VMEM tiling and
halo traffic explicitly (the SODA reuse-buffer analog, SURVEY.md §2.1).

Semantics match the NumPy oracle: zero-fill taps, wide-int accumulators
(int32 on TPU — see ir/types.py), C division, masking at stores.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from ..ir.program import StencilProgram
from ..interp.evaluator import EvalContext, eval_expr, store_cast


def shifted_jnp(a: jax.Array, offsets: tuple[int, ...]) -> jax.Array:
    """out[i] = a[i + off], zero fill out of bounds (static shapes)."""
    from ..interp.wide64 import W
    from ..interp.wide128 import V

    if isinstance(a, (W, V)):  # limb carriers: shift each plane/limb
        return a.map(lambda p: shifted_jnp(p, offsets))
    pads = [(max(-off, 0), max(off, 0)) for off in offsets]
    ap = jnp.pad(a, pads)
    out_slices = [
        slice(off + hi, off + hi + n)
        for n, off, (hi, _lo) in zip(a.shape, offsets, pads)
    ]
    return ap[tuple(out_slices)]


def _needs_wide(program: StencilProgram) -> bool:
    """True when any tensor/param is wider than the 32-bit TPU word
    (incl. synthetic stages: running them in x64 wide mode keeps the
    oracle-exact semantics their int64 typing exists for)."""
    types = [t.type for t in program.tensors.values()]
    types += [p.type for p in program.params.values()]
    return any(t.width > 32 for t in types)


def user_wide_types(program: StencilProgram) -> list[str]:
    """Names of USER-declared >32-bit tensors/params (synthetic
    compiler-generated stages excluded) — the shared predicate for the
    32-bit-carrier paths' loud rejections."""
    out = [n for n, t in program.tensors.items()
           if t.type.width > 32 and not t.synthetic]
    out += [p.name for p in program.params.values() if p.type.width > 32]
    return out


def _compute_dtype(program: StencilProgram, name: str, wide: bool = False):
    t = program.tensors[name].type
    if t.is_float:
        return jnp.float64 if wide and t.width > 32 else jnp.float32
    if wide:
        return jnp.int64
    return jnp.int32


def _sweep(program: StencilProgram, arrays: dict, params: dict,
           int_width: int = 32) -> dict:
    """One sweep over full grids; returns updated tensor dict."""
    if int_width == 128:
        from ..interp.wide128 import Wide128XP

        xp = Wide128XP(jnp)
    else:
        xp = jnp
    ctx = EvalContext(
        program=program,
        xp=xp,
        tap=lambda name, off: shifted_jnp(arrays[name], off),
        params=params,
        int_width=int_width,
    )
    for name in program.stage_order():
        t = program.tensors[name]
        v, vt = eval_expr(t.expr, ctx)
        arrays[name] = store_cast(ctx, v, vt, t.type)
    return arrays


def build_fn(program: StencilProgram, iterate: int | None = None):
    """Build a jittable fn(inputs: dict, params: dict) -> dict of outputs.

    Arrays are in TPU compute dtypes (float32 / int32).  Programs with
    >32-bit types run in WIDE mode: int64 accumulators (exact — XLA
    emulates s64 on TPU) and float64 (XLA's f32-pair emulation, ~2^-50
    precision); requires jax x64 — run() wraps the call in
    jax.enable_x64(True).  The caller converts to declared
    storage dtypes if needed (run() does this)."""
    from ..interp.wide128 import V, program_is_128

    it = program.iterate if iterate is None else iterate
    it = max(it, 1)
    in_name = program.input_names[0]
    out_name = program.output_names[0]
    w128 = program_is_128(program)
    wide = _needs_wide(program)
    int_width = 128 if w128 else (64 if wide else 32)

    def fn(inputs: Mapping[str, jax.Array], params: Mapping[str, jax.Array]):
        if wide and not jax.config.jax_enable_x64:
            raise RuntimeError(
                f"program {program.name!r} uses >32-bit types: run under "
                "jax.enable_x64(True) (xla.run does this "
                "automatically)")
        arrays = {}
        for n in program.input_names:
            v = inputs[n]
            if isinstance(v, V):
                arrays[n] = v  # quad-limb carriers arrive pre-wrapped
            else:
                arrays[n] = jnp.asarray(
                    v, _compute_dtype(program, n, wide))
        params_c = {k: (v if isinstance(v, V) else jnp.asarray(v))
                    for k, v in params.items()}

        if it == 1:
            arrays = _sweep(program, arrays, params_c, int_width)
            return {n: arrays[n] for n in program.output_names}

        def body(arrs, _):
            arrs = dict(arrs)
            arrs = _sweep(program, arrs, params_c, int_width)
            # feedback: first output -> first input; aux inputs carry over
            nxt = {n: arrs[n] for n in program.input_names}
            nxt[in_name] = arrs[out_name]
            return nxt, None

        # it-1 sweeps in the scan, then ONE final sweep outside it: the
        # final full-DAG evaluation yields every output's last-sweep value
        # (multi-output iterate: non-feedback outputs are final-sweep-only)
        state = {n: arrays[n] for n in program.input_names}
        if it > 1:
            state, _ = jax.lax.scan(body, state, None, length=it - 1)
        final = _sweep(program, dict(state), params_c, int_width)
        return {n: final[n] for n in program.output_names}

    return fn


def run(
    program: StencilProgram,
    inputs: Mapping[str, "jnp.ndarray"],
    params: Mapping[str, "jnp.ndarray"] | None = None,
    iterate: int | None = None,
    jit: bool = True,
):
    """Execute and return numpy outputs in declared storage dtypes."""
    import numpy as np

    from .pallas import _check_io, finalize_outputs

    _check_io(program, inputs, params or {})
    fn = build_fn(program, iterate)
    if jit:
        fn = jax.jit(fn)

    from ..interp import wide128

    if wide128.program_is_128(program):
        # >64-bit ints: host boundary converts object arrays of Python
        # ints to quad-limb V carriers (a pytree — jits fine) and back;
        # floats still ride x64 for f64
        def _to_v(v, t):
            if t.is_int and t.width > 64 and not isinstance(v, wide128.V):
                # wrap with the CARRIER rep (evaluator.acc_of): only
                # full-width unsigned stays "u"; narrower unsigned (e.g.
                # uint100) promotes to the signed int128 carrier — using
                # "u" here would flip the scan-carry pytree metadata
                # between input ("u") and stored stage value ("i") and
                # crash iterate>1 programs
                rep = "u" if (not t.is_signed and t.width >= 128) else "i"
                return wide128._object_to_limbs(
                    np.asarray(v, dtype=object), rep, jnp)
            return v

        ins_v = {n: _to_v(inputs[n], program.tensors[n].type)
                 for n in program.input_names}
        par_v = {n: _to_v((params or {})[n], program.params[n].type)
                 for n in (params or {})}
        with jax.enable_x64(True):
            outs = fn(ins_v, par_v)
        res = {}
        for n, v in outs.items():
            t = program.tensors[n].type
            if isinstance(v, wide128.V):
                res[n] = (wide128.to_object_array(v, t.is_signed)
                          if v.rep != "p" else np.asarray(v.l))
            else:
                res[n] = np.asarray(v)
        return finalize_outputs(program, res)
    if _needs_wide(program):
        # 64-bit programs: exact int64 (XLA-emulated s64 on TPU) and
        # emulated float64; scoped so the global default dtypes stay 32-bit
        with jax.enable_x64(True):
            outs = fn(dict(inputs), dict(params or {}))
            outs = {k: np.asarray(v) for k, v in outs.items()}
    else:
        outs = fn(dict(inputs), dict(params or {}))
    return finalize_outputs(program, outs)
