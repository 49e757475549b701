"""Computation-reuse (tcse) pass tests — the DAC'20 rewrite analog
(reference: src/soda/optimization/tcse.py, SURVEY.md §2.1 L6)."""

import pathlib

import numpy as np

from soda_tpu.frontend.parser import parse, parse_file
from soda_tpu.interp import numpy_interp
from soda_tpu.optimize import tcse

SODA = pathlib.Path(__file__).parent / "soda"
rng = np.random.default_rng(21)


BOX9 = (
    "kernel: box9\n"
    "input uint16: img(512, *)\n"
    "output uint16: out(0, 0) = (img(-1,-1) + img(-1,0) + img(-1,1)"
    " + img(0,-1) + img(0,0) + img(0,1)"
    " + img(1,-1) + img(1,0) + img(1,1)) / 9\n"
)


def test_box9_decomposes_two_levels():
    p = parse(BOX9)
    q = tcse.apply(p)
    # 3x3 box sum -> column sums + row sum of column sums
    assert len(q.stage_order()) == 2  # out + 1 hoisted stage
    hoisted = [n for n in q.tensors if "__cse" in n]
    assert len(hoisted) == 1
    assert tcse.count_adds(q) < tcse.count_adds(p)
    assert tcse.count_adds(q) == 4  # 2 (row sum) + 2 (column sum)


def test_box9_bit_exact_int():
    p = parse(BOX9)
    q = tcse.apply(p)
    x = rng.integers(0, 65535, (40, 56)).astype(np.uint16)
    a = numpy_interp.run(p, {"img": x})["out"]
    b = numpy_interp.run(q, {"img": x})["out"]
    # partial-sum stages widen the border-invalid rim (composed radii);
    # the valid interior is bit-exact (integer reassociation is exact)
    rim = q.valid_rim()
    sl = (slice(rim, -rim), slice(rim, -rim))
    assert np.array_equal(a[sl], b[sl])


def test_seidel_float_close():
    p = parse_file(SODA / "seidel2d.soda")
    q = tcse.apply(p)
    assert tcse.count_adds(q) < tcse.count_adds(p)
    x = rng.standard_normal((32, 48)).astype(np.float32)
    a = numpy_interp.run(p, {"s0": x})["s1"]
    b = numpy_interp.run(q, {"s0": x})["s1"]
    rim = q.valid_rim()
    sl = (slice(rim, -rim), slice(rim, -rim))
    assert np.allclose(a[sl], b[sl], rtol=1e-5, atol=1e-5)


def test_plus_shape_not_decomposed():
    # 5-point jacobi has no uniform generator/stride tiling
    p = parse_file(SODA / "jacobi2d.soda")
    q = tcse.apply(p)
    assert tcse.count_adds(q) == tcse.count_adds(p)
    assert not [n for n in q.tensors if "__cse" in n]


def test_non_sum_programs_untouched():
    for name in ("blur", "sobel2d", "denoise2d"):
        p = parse_file(SODA / f"{name}.soda")
        q = tcse.apply(p)
        x_adds = tcse.count_adds(p)
        # blur's 3-tap rows are chains (m=3, G=1): cost 2 == n-1 -> no gain
        assert tcse.count_adds(q) <= x_adds


def test_hoisted_stage_type_is_wide():
    p = parse(BOX9)
    q = tcse.apply(p)
    h = [n for n in q.tensors if "__cse" in n][0]
    assert q.tensors[h].type.width == 32  # partial sums don't mask at uint16


def test_pallas_runs_tcse_program():
    from soda_tpu.backend import pallas as pb

    p = parse(BOX9)
    q = tcse.apply(p)
    x = rng.integers(0, 65535, (48, 128)).astype(np.uint16)
    gold = numpy_interp.run(p, {"img": x})["out"]
    got = pb.run(q, {"img": x}, interpret=True)["out"]
    rim = q.valid_rim()
    sl = (slice(rim, -rim), slice(rim, -rim))
    assert np.array_equal(got[sl], gold[sl])


def test_big_box_25():
    src = (
        "kernel: box25\n"
        "input float: a(512, *)\n"
        "output float: out(0, 0) = ("
        + " + ".join(f"a({i},{j})" for i in range(-2, 3) for j in range(-2, 3))
        + ") * 0.04f\n"
    )
    p = parse(src)
    q = tcse.apply(p)
    # 24 adds -> at worst the separable 8 (4 row + 4 column); the recursive
    # pass finds 6 via second-level reuse of pair sums
    assert tcse.count_adds(p) == 24
    assert tcse.count_adds(q) <= 8
    x = rng.standard_normal((32, 48)).astype(np.float32)
    a = numpy_interp.run(p, {"a": x})["out"]
    b = numpy_interp.run(q, {"a": x})["out"]
    rim = q.valid_rim()
    sl = (slice(rim, -rim), slice(rim, -rim))
    assert np.allclose(a[sl], b[sl], rtol=1e-4, atol=1e-5)
