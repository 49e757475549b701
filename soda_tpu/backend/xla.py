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
    pads = [(max(-off, 0), max(off, 0)) for off in offsets]
    ap = jnp.pad(a, pads)
    out_slices = [
        slice(off + hi, off + hi + n)
        for n, off, (hi, _lo) in zip(a.shape, offsets, pads)
    ]
    return ap[tuple(out_slices)]


def _compute_dtype(program: StencilProgram, name: str):
    t = program.tensors[name].type
    if t.is_float:
        return jnp.float32
    return jnp.int32


def _sweep(program: StencilProgram, arrays: dict, params: dict) -> dict:
    """One sweep over full grids; returns updated tensor dict."""
    ctx = EvalContext(
        program=program,
        xp=jnp,
        tap=lambda name, off: shifted_jnp(arrays[name], off),
        params=params,
        int_width=32,
    )
    for name in program.stage_order():
        t = program.tensors[name]
        v, vt = eval_expr(t.expr, ctx)
        arrays[name] = store_cast(ctx, v, vt, t.type)
    return arrays


def build_fn(program: StencilProgram, iterate: int | None = None):
    """Build a jittable fn(inputs: dict, params: dict) -> dict of outputs.

    Arrays are in TPU compute dtypes (float32 / int32); the caller converts
    to declared storage dtypes if needed (run() does this)."""
    it = program.iterate if iterate is None else iterate
    it = max(it, 1)
    in_name = program.input_names[0]
    out_name = program.output_names[0]

    def fn(inputs: Mapping[str, jax.Array], params: Mapping[str, jax.Array]):
        arrays = {n: jnp.asarray(inputs[n], _compute_dtype(program, n))
                  for n in program.input_names}
        params_c = {k: jnp.asarray(v) for k, v in params.items()}

        if it == 1:
            arrays = _sweep(program, arrays, params_c)
            return {n: arrays[n] for n in program.output_names}

        def body(arrs, _):
            arrs = dict(arrs)
            arrs = _sweep(program, arrs, params_c)
            # feedback: output -> first input; auxiliary inputs carry over
            nxt = {n: arrs[n] for n in program.input_names}
            nxt[in_name] = arrs[out_name]
            return nxt, None

        state = {n: arrays[n] for n in program.input_names}
        state, _ = jax.lax.scan(body, state, None, length=it)
        return {out_name: state[in_name]}

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
    outs = fn(dict(inputs), dict(params or {}))
    return finalize_outputs(program, outs)
