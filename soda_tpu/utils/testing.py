"""Shared oracle-comparison helpers for the CPU test suite AND the
hardware gate (scripts/tpu_check.py) — one definition of the random
input distributions and the rim-excluded comparison gates, so a
tolerance calibration cannot silently diverge between the two
(review r5).

Gate summary (docs/SEMANTICS.md):
- integer outputs compare BIT-exact (a float64 cast would hide dropped
  low-limb carries beyond 2^53 on the wide path);
- `half` programs gate at f16 scale (the oracle rounds per op, the TPU
  computes f32 between f16-rounded stores);
- f32 libm-transcendental programs gate at 2e-3 (Mosaic lowers
  tanh/log1p/log10/exp to low-precision vector approximations —
  hardware-measured max rel err 2.6e-4; f64/DS programs never touch
  them and keep 1e-4).
"""
from __future__ import annotations

import numpy as np


def rand_inputs(p, shape, rng):
    """Random inputs + params for `p`: signed ints draw negatives
    (sign-dependent C semantics), >32-bit draws exercise the pair/limb
    carriers past int32, >64-bit builds object arrays of Python ints."""
    ins = {}
    for n in p.input_names:
        t = p.tensors[n].type
        if t.is_float:
            ins[n] = rng.standard_normal(shape).astype(t.np_dtype())
        elif t.kind == "int" and t.width > 64:
            hi = rng.integers(0, 1 << (min(t.width, 127) - 65),
                              shape).astype(object)
            lo = rng.integers(0, 1 << 62, shape).astype(object)
            ins[n] = (hi << 64) | lo
        elif t.kind == "int" and t.width > 32:
            ins[n] = rng.integers(-(1 << 40), 1 << 40, shape).astype(
                t.np_dtype())
        elif t.kind == "int":
            hi = 1 << min(t.width - 1, 12)
            ins[n] = rng.integers(-hi, hi, shape).astype(t.np_dtype())
        elif t.width > 32:
            ins[n] = rng.integers(0, 1 << 40, shape).astype(t.np_dtype())
        else:
            ins[n] = rng.integers(0, min(250, (1 << t.width) - 1),
                                  shape).astype(t.np_dtype())
    ps = {pp.name: rng.standard_normal(pp.shape).astype(pp.type.np_dtype())
          for pp in p.params.values()}
    return ins, ps


def compare_outputs(p, got, gold, rim) -> bool:
    """Rim-excluded comparison: ints BIT-exact, floats at the
    program-derived tolerance.  Returns False (never raises) so the
    hardware gate can count failures; refuses a vacuous pass on an
    all-rim grid."""
    def interior(a):
        if rim == 0:
            return a
        return a[tuple(slice(rim, -rim) for _ in range(a.ndim))]

    half = any(t.type.is_float and t.type.width == 16
               for t in p.tensors.values())
    f32_libm = (p.uses_libm_transcendentals()
                and p.max_float_width() == 32)
    tol = 2e-2 if half else (2e-3 if f32_libm else 1e-4)
    for k in gold:
        a, b = interior(np.asarray(got[k])), interior(np.asarray(gold[k]))
        if a.size == 0:
            return False
        if not p.tensors[k].type.is_float:
            if not np.array_equal(a, b):
                return False
        elif not np.allclose(a.astype(np.float64), b.astype(np.float64),
                             rtol=tol, atol=tol):
            return False
    return True


def assert_outputs_match(p, got, gold, rim=None) -> None:
    """pytest-friendly wrapper: same gates, with a max-diff message."""
    rim = p.valid_rim() if rim is None else rim
    assert compare_outputs(p, got, gold, rim), "; ".join(
        f"{k}: max diff "
        f"{np.abs(np.asarray(got[k]).astype(np.float64) - np.asarray(gold[k]).astype(np.float64)).max()}"
        for k in gold)
