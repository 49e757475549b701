"""emit_pipeline line-buffer engine ("ep") tests.

The ep engine replaces pl.pallas_call's automatic pipeline with an
explicit pltpu.emit_pipeline march whose copy-in fires only when the
block index CHANGES between consecutive steps (jax pipeline.py,
initialize_step `block_changed` / _default_schedule `copy_in`), so the
final flush step's block re-fetch is elided and the march reads each
cell exactly once — the last 1/G of the single-chip roofline
(reference: SODA's FPGA line buffer is exactly one-read-per-cell;
SURVEY.md §2.1 kernel codegen row, §6 jacobi3d headline).

Every test compares against the NumPy golden interpreter; the engine is
restored by the fixture even on failure.
"""

import numpy as np
import pytest

from soda_tpu.backend import pallas as pb
from soda_tpu.frontend.parser import parse_file
from soda_tpu.interp import numpy_interp
from soda_tpu.plan import planner
from soda_tpu.utils import config


@pytest.fixture
def ep_engine():
    config.set_lb_engine("ep")
    yield
    config.set_lb_engine(None)


def _inputs(p, shape, seed=0):
    rng = np.random.default_rng(seed)
    ins = {}
    for n in p.input_names:
        t = p.tensors[n].type
        if t.is_float:
            v = (rng.standard_normal(shape) * 2).astype(
                np.float64 if t.width >= 32 else np.float32)
            ins[n] = v.astype(t.np_dtype())
        else:
            ins[n] = rng.integers(0, 100, shape).astype(t.np_dtype())
    return ins


def _check(p, shape, budget, *, need_hy=None, seed=0, tol=1e-5):
    ins = _inputs(p, shape, seed)
    gold = numpy_interp.run(p, ins)
    pln = planner.plan(p, shape, vmem_budget=budget)
    g = pln.groups[0]
    assert g.strategy == "linebuffer", g.describe()
    if need_hy is not None:
        hy = max((g.halo[i][1][0] for i in g.external_inputs), default=0)
        assert (hy > 0) == need_hy, g.describe()
    got = pb.run(p, ins, the_plan=pln, interpret=True)
    rim = p.valid_rim()
    sl = tuple(slice(rim, -rim if rim else None) for _ in shape)
    for k in gold:
        a = np.asarray(got[k], np.float64)[sl]
        b = np.asarray(gold[k], np.float64)[sl]
        if not p.tensors[k].type.is_float:
            assert np.array_equal(a, b), k
        else:
            assert np.allclose(a, b, rtol=tol, atol=tol), (
                k, np.abs(a - b).max())
    return pln


@pytest.mark.parametrize("path,shape", [
    ("tests/soda/blur.soda", (48, 128)),          # 2-D uint16
    ("tests/soda/jacobi3d.soda", (24, 32, 128)),  # 3-D single stage
    ("tests/soda/denoise3d.soda", (16, 32, 128)),  # 3-D multi-stage creep
    ("tests/soda/gradient2d.soda", (48, 128)),    # multi-output
])
def test_ep_matches_oracle(ep_engine, path, shape):
    p = parse_file(path)
    _check(p, shape, 4 * 2**20)


def test_ep_traffic_is_exact_ideal(ep_engine):
    """The model records one read + one write per cell — no (G+1)/G
    lookahead term — and the kernel passes the oracle at that plan."""
    p = parse_file("tests/soda/jacobi3d.soda")
    pln = _check(p, (24, 32, 128), 4 * 2**20)
    g = pln.groups[0]
    assert g.hbm_bytes_per_call == g.useful_cells_per_call * 8  # 4 B in + 4 B out


def test_ep_wide_pairs(ep_engine):
    """64-bit plane-pair carriers ride the ep march (2-D and 3-D)."""
    for path, shape in [("tests/soda/accum64.soda", (48, 128)),
                        ("tests/soda/poisson3d_f64.soda", (16, 32, 128))]:
        p = parse_file(path)
        _check(p, shape, 8 * 2**20, tol=1e-9)


def test_ep_half_bits(ep_engine):
    """f16 bit-pattern streaming through the ep march."""
    p = parse_file("tests/soda/smooth_half.soda")
    _check(p, (48, 128), 4 * 2**20, tol=2e-2)


def test_ep_hybrid_rim(ep_engine):
    """Unaligned grids: the march clips its HBM views to the aligned
    core (emit_pipeline tiles evenly); the XLA rim pass covers the rest."""
    for path, shape in [("tests/soda/jacobi3d.soda", (29, 37, 128)),
                        ("tests/soda/blur.soda", (53, 128))]:
        p = parse_file(path)
        ins = _inputs(p, shape)
        gold = numpy_interp.run(p, ins)
        pln = planner.plan(p, shape, vmem_budget=4 * 2**20)
        g = pln.groups[0]
        assert g.strategy == "linebuffer" and g.core is not None
        got = pb.run(p, ins, the_plan=pln, interpret=True)
        rim = p.valid_rim()
        sl = tuple(slice(rim, -rim) for _ in shape)
        for k in gold:
            assert np.allclose(np.asarray(got[k], np.float64)[sl],
                               np.asarray(gold[k], np.float64)[sl],
                               rtol=1e-5, atol=1e-5), k


def test_ep_y_tiled_strips(ep_engine):
    """hy > 0: the y-strip pieces address the same HBM ref through
    strip-granular BlockSpecs."""
    p = parse_file("tests/soda/jacobi3d.soda")
    _check(p, (16, 256, 128), 1400 * 1024, need_hy=True)


def test_ep_ineligible_strips_fall_back():
    """by % hy != 0 or an unaligned lane dim keeps the mosaic engine (and
    its traffic model): lb_ep_eligible gates both planner and builder
    identically."""
    assert config.lb_ep_eligible(128, 0, 512)
    assert config.lb_ep_eligible(256, 8, 512)
    assert not config.lb_ep_eligible(128, 16, 24)
    # unaligned lane dim: Mosaic rejects the memref_slice DMA (hardware-
    # measured at 500-wide grids) — never eligible regardless of strips
    assert not config.lb_ep_eligible(500)
    assert not config.lb_ep_eligible(500, 8, 512)


def test_ep_unaligned_lane_falls_back(ep_engine):
    """An unaligned lane dim under the ep engine keeps the mosaic march:
    the planner models the (G+1)/G flush re-fetch and the kernel still
    passes the oracle (hardware: jacobi3d 500^3 ep memref_slice crash)."""
    p = parse_file("tests/soda/jacobi3d.soda")
    shape = (24, 32, 120)  # lane dim 120 % 128 != 0
    pln = _check(p, shape, 4 * 2**20)
    g = pln.groups[0]
    # mosaic-march traffic: strictly more than one read per cell
    assert g.hbm_bytes_per_call > g.useful_cells_per_call * 8


def test_engine_env_roundtrip():
    assert config.lb_engine() in ("mosaic", "ep")
    config.set_lb_engine("ep")
    assert config.lb_engine() == "ep"
    config.set_lb_engine(None)
    with pytest.raises(ValueError):
        config.set_lb_engine("bogus")
