#!/usr/bin/env python
"""Validate the compiled Pallas backend on real TPU hardware.

Runs every corpus program through the compiled (non-interpret) Pallas path
on the attached TPU and checks against the NumPy oracle.  The CPU CI suite
(tests/) covers the same path in interpret mode; this script is the
hardware truth.  Run with the default (axon) platform:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_check.py

NOTE: do not override PYTHONPATH wholesale — the axon PJRT plugin registers
via sitecustomize in $PYTHONPATH (/root/.axon_site); dropping it makes the
'axon' backend unknown.
"""

import glob
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from soda_tpu.frontend.parser import parse_file
from soda_tpu.interp import numpy_interp
from soda_tpu.backend import pallas as pallas_backend

SODA = pathlib.Path(__file__).resolve().parents[1] / "tests" / "soda"
SHAPES = {1: (2048,), 2: (48, 128), 3: (24, 32, 128)}


def main() -> int:
    import jax

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rng = np.random.default_rng(7)
    failures = 0
    for f in sorted(glob.glob(str(SODA / "*.soda"))):
        p = parse_file(f)
        ins = {}
        for n in p.input_names:
            t = p.tensors[n].type
            shape = SHAPES[p.rank]
            if t.is_float:
                ins[n] = rng.standard_normal(shape).astype(t.np_dtype())
            else:
                ins[n] = rng.integers(0, 250, shape).astype(t.np_dtype())
        ps = {pp.name: rng.standard_normal(pp.shape).astype(pp.type.np_dtype())
              for pp in p.params.values()}
        gold = numpy_interp.run(p, ins, ps)
        # oracle chain: TPU output must also match the NATIVE C++ golden
        # runner (which is bit-exact vs the NumPy oracle — enforced here)
        import shutil
        if shutil.which("g++"):
            from soda_tpu.backend import cpp as cpp_backend

            cgold = cpp_backend.compile_and_run(p, ins, ps)
            for k in gold:
                if not np.array_equal(cgold[k], gold[k]):
                    print(f"{pathlib.Path(f).stem}: C++/NumPy oracle mismatch!")
                    failures += 1
        try:
            got = pallas_backend.run(p, ins, ps, vmem_budget=4 * 2**20)
        except Exception as e:  # noqa: BLE001
            print(f"{pathlib.Path(f).stem}: COMPILE/RUN FAILED: {type(e).__name__}")
            failures += 1
            continue
        rim = p.valid_rim()

        def interior(a):
            if rim == 0:
                return a
            return a[tuple(slice(rim, -rim) for _ in range(a.ndim))]

        # half: TPU computes f32 between f16-rounded stores; the oracle
        # rounds per op — f16-scale tolerance (docs/SEMANTICS.md)
        half = any(t.type.is_float and t.type.width == 16
                   for t in p.tensors.values())
        tol = 2e-2 if half else 1e-4
        ok = all(
            np.allclose(interior(got[k]).astype(np.float64),
                        interior(gold[k]).astype(np.float64),
                        rtol=tol, atol=tol)
            for k in gold)
        print(f"{pathlib.Path(f).stem}: {'OK' if ok else 'MISMATCH'}")
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
