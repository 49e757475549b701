"""Property-based cross-backend fuzzing: random stencil programs must
agree across NumPy oracle, XLA backend, Pallas (interpret), and the
generated C++ golden runner.

Seeded and deterministic.  Programs are generated from a small grammar of
safe expressions (no division by dynamic values; bounded tap radii)."""

import random
import shutil

import numpy as np
import pytest

from soda_tpu.frontend.parser import parse
from soda_tpu.interp import numpy_interp
from soda_tpu.backend import xla as xla_backend
from soda_tpu.backend import pallas as pallas_backend
from soda_tpu.backend import cpp as cpp_backend


def gen_program(rng: random.Random, rank: int) -> str:
    """Random 1-3 stage program over one input."""
    ftype = rng.choice(["float", "int16", "uint16", "int32"])
    is_float = ftype == "float"
    n_stages = rng.randint(1, 3)
    tile = ", ".join(["64"] * (rank - 1) + ["*"])
    lines = [f"kernel: fuzz", f"input {ftype}: a({tile})"]
    prev = ["a"]

    def off():
        return ", ".join(str(rng.randint(-2, 2)) for _ in range(rank))

    def term(src):
        r = f"{src}({off()})"
        if is_float:
            k = rng.random()
            if k < 0.3:
                return f"{r} * {round(rng.uniform(-2, 2), 3)}f"
            if k < 0.4:
                return f"abs({r})"
            return r
        k = rng.random()
        if k < 0.3:
            return f"{r} * {rng.randint(1, 3)}"
        return r

    for s in range(n_stages):
        src = rng.choice(prev)
        nterms = rng.randint(2, 5)
        expr = " + ".join(term(src) for _ in range(nterms))
        if rng.random() < 0.4:
            expr = f"({expr}) / {rng.choice(['2', '4'] if not is_float else ['2.0f', '4.0f'])}"
        kind = "output" if s == n_stages - 1 else "local"
        name = "out" if kind == "output" else f"s{s}"
        anchor = ", ".join(["0"] * rank)
        lines.append(f"{kind} {ftype}: {name}({anchor}) = {expr}")
        prev.append(name)
    return "\n".join(lines) + "\n"


def make_input(p, shape, rng_np):
    t = p.tensors["a"].type
    if t.is_float:
        return rng_np.standard_normal(shape).astype(t.np_dtype())
    return rng_np.integers(0, 200, shape).astype(t.np_dtype())


def interior(a, rim):
    if rim == 0:
        return a
    return a[tuple(slice(rim, -rim) for _ in range(a.ndim))]


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("rank", [2, 3])
def test_fuzz_backends_agree(seed, rank):
    rng = random.Random(1000 * rank + seed)
    src = gen_program(rng, rank)
    p = parse(src)
    shape = (32, 48) if rank == 2 else (16, 24, 48)
    x = make_input(p, shape, np.random.default_rng(seed))
    gold = numpy_interp.run(p, {"a": x})["out"]
    rim = p.valid_rim()

    got_x = xla_backend.run(p, {"a": x})["out"]
    assert np.allclose(interior(got_x, rim).astype(np.float64),
                       interior(gold, rim).astype(np.float64),
                       rtol=1e-4, atol=1e-4), f"xla mismatch:\n{src}"

    got_p = pallas_backend.run(p, {"a": x}, interpret=True,
                               vmem_budget=2 * 2**20)["out"]
    assert np.allclose(interior(got_p, rim).astype(np.float64),
                       interior(gold, rim).astype(np.float64),
                       rtol=1e-4, atol=1e-4), f"pallas mismatch:\n{src}"


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_fuzz_cpp_bit_exact(seed, tmp_path):
    rng = random.Random(seed)
    src = gen_program(rng, 2)
    p = parse(src)
    x = make_input(p, (24, 32), np.random.default_rng(seed))
    gold = numpy_interp.run(p, {"a": x})["out"]
    got = cpp_backend.compile_and_run(p, {"a": x}, workdir=tmp_path)["out"]
    assert np.array_equal(got, gold), f"C++ mismatch:\n{src}"


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_tcse_preserves_semantics(seed):
    """tcse applied to random programs stays interior-equal (exact for
    ints, tolerance for floats)."""
    from soda_tpu.optimize import tcse

    rng = random.Random(7000 + seed)
    src = gen_program(rng, 2)
    p = parse(src)
    q = tcse.apply(p)
    x = make_input(p, (32, 48), np.random.default_rng(seed))
    a = numpy_interp.run(p, {"a": x})["out"]
    b = numpy_interp.run(q, {"a": x})["out"]
    rim = max(p.valid_rim(), q.valid_rim())
    ga = interior(a, rim).astype(np.float64)
    gb = interior(b, rim).astype(np.float64)
    if p.tensors["a"].type.is_int:
        assert np.array_equal(ga, gb), f"tcse int mismatch:\n{src}"
    else:
        assert np.allclose(ga, gb, rtol=1e-4, atol=1e-4), f"tcse:\n{src}"


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_fuzz_cpp_bit_exact_3d(seed, tmp_path):
    rng = random.Random(500 + seed)
    src = gen_program(rng, 3)
    p = parse(src)
    x = make_input(p, (10, 12, 16), np.random.default_rng(seed))
    gold = numpy_interp.run(p, {"a": x})["out"]
    got = cpp_backend.compile_and_run(p, {"a": x}, workdir=tmp_path)["out"]
    assert np.array_equal(got, gold), f"C++ 3D mismatch:\n{src}"


def gen_two_input_program(rng: random.Random) -> str:
    lines = ["kernel: fuzz2", "input float: a(64, *)", "input float: b(64, *)"]

    def off():
        return f"{rng.randint(-2, 2)}, {rng.randint(-2, 2)}"

    expr = " + ".join(
        f"{rng.choice(['a', 'b'])}({off()}) * {round(rng.uniform(-2, 2), 3)}f"
        for _ in range(rng.randint(3, 6)))
    lines.append(f"local float: s0(0, 0) = {expr}")
    expr2 = " + ".join(
        f"{rng.choice(['a', 'b', 's0'])}({off()})" for _ in range(3))
    lines.append(f"output float: out(0, 0) = {expr2}")
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_two_inputs(seed):
    rng = random.Random(9000 + seed)
    src = gen_two_input_program(rng)
    p = parse(src)
    rnp = np.random.default_rng(seed)
    a = rnp.standard_normal((32, 48)).astype(np.float32)
    b = rnp.standard_normal((32, 48)).astype(np.float32)
    gold = numpy_interp.run(p, {"a": a, "b": b})["out"]
    rim = p.valid_rim()
    got = pallas_backend.run(p, {"a": a, "b": b}, interpret=True,
                             vmem_budget=2 * 2**20)["out"]
    assert np.allclose(interior(got, rim).astype(np.float64),
                       interior(gold, rim).astype(np.float64),
                       rtol=1e-4, atol=1e-4), f"two-input mismatch:\n{src}"
