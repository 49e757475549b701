"""Planner tests: span math, halo alignment, VMEM budgeting, sweep chunking
(the VMEM analog of the reference's reuse-buffer minimality math,
SURVEY.md §3(b))."""

import pathlib

import pytest

from soda_tpu.frontend.parser import parse, parse_file
from soda_tpu.plan.planner import group_spans, plan

SODA = pathlib.Path(__file__).parent / "soda"


def test_group_spans_blur():
    p = parse_file(SODA / "blur.soda")
    spans = group_spans(p, p.stage_order(), p.output_names)
    assert spans["blur_y"] == ((0, 0), (0, 0))
    assert spans["blur_x"] == ((-1, 1), (0, 0))
    # input: blur_x span (-1,1),(0,0) composed with taps (0,0..2)
    assert spans["input"] == ((-1, 1), (0, 2))


def test_group_spans_multistage_denoise():
    p = parse_file(SODA / "denoise3d.soda")
    spans = group_spans(p, p.stage_order(), p.output_names)
    # unew reads w at radius 1, w reads grad at 0, grad reads u at radius 1
    assert spans["w"] == ((-1, 1), (-1, 1), (-1, 1))
    assert spans["u"] == ((-2, 2), (-2, 2), (-2, 2))
    assert spans["rhs"] == ((0, 0), (0, 0), (0, 0))


def test_halo_alignment_rules():
    p = parse_file(SODA / "jacobi3d.soda")
    # block_override forces the windows strategy (linebuffer has no halos)
    pl = plan(p, (64, 64, 128), block_override=(8, 32, 128))
    g = pl.groups[0]
    assert g.strategy == "windows"
    h = g.halo["t0"]
    assert h[0] == (1, 1)        # leading dim: exact radius
    assert h[1] == (8, 8)        # sublane dim: rounded to 8
    assert h[2] == (0, 0)        # lane dim: never haloed
    assert all(b % 8 == 0 for b in g.block[:-1])
    assert g.block[-1] == 128    # lane dim untiled


def test_linebuffer_chosen_for_3d_single_sweep():
    p = parse_file(SODA / "jacobi3d.soda")
    pl = plan(p, (512, 512, 512))
    g = pl.groups[0]
    assert g.strategy == "linebuffer"
    bpc = g.hbm_bytes_per_call / g.useful_cells_per_call
    assert bpc <= 8.25  # >= 97% of the 8 B/cell single-sweep roofline
    # no host-pad copies: halos all zero
    assert all(h == ((0, 0),) * 3 for h in g.halo.values())


def test_sweeps_fused_and_halo_scaled():
    p = parse_file(SODA / "jacobi2d.soda")  # iterate 8, radius 1
    pl = plan(p, (512, 512))
    g = pl.groups[0]
    assert g.sweeps == 8
    assert g.halo["t0"][0] == (8, 8)  # 8 sweeps × radius 1, already 8-aligned


def test_vmem_budget_respected():
    p = parse_file(SODA / "jacobi3d.soda")
    for budget in (2 * 2**20, 8 * 2**20, 16 * 2**20):
        pl = plan(p, (256, 256, 256), vmem_budget=budget)
        # the linebuffer strategy gets hardware-calibrated headroom of
        # 126/96 over the general budget (see planner lb_budget comment);
        # other strategies stay within the budget exactly
        scale = (126 / 96 if pl.groups[0].strategy == "linebuffer" else 1.0)
        assert pl.groups[0].vmem_bytes <= budget * scale


def test_sweep_chunking_on_halo_blowup():
    # iterate so large the halo would dwarf any feasible block
    p = parse(
        "kernel: t\niterate: 64\ninput float: a(64, *)\n"
        "output float: b(0,0) = (a(-1,0) + a(1,0) + a(0,0)) / 3.0f\n"
    )
    pl = plan(p, (64, 128), vmem_budget=1 * 2**20, max_compute_waste=1.5)
    g = pl.groups[0]
    assert g.sweeps < 64
    assert 64 % g.sweeps == 0
    assert any("reduced fused sweeps" in n or "adjusted" in n
               or "auto sweeps" in n for n in pl.notes)


def test_traffic_accounting_improves_with_fusion():
    p = parse_file(SODA / "jacobi2d.soda")
    full = plan(p, (1024, 1024))
    single = plan(p, (1024, 1024), sweeps=1)
    b_full = full.groups[0].hbm_bytes_per_call / full.groups[0].useful_cells_per_call
    b_single = (single.groups[0].hbm_bytes_per_call
                / single.groups[0].useful_cells_per_call)
    assert b_full < b_single  # temporal fusion reduces bytes/cell-update


def test_plan_json_roundtrip():
    p = parse_file(SODA / "denoise3d.soda")
    pl = plan(p, (64, 64, 128))
    import json
    j = json.loads(json.dumps(pl.to_json()))
    assert j["program"] == "denoise3d"
    assert j["groups"][0]["stages"] == ["grad", "w", "unew"]
    assert j["groups"][0]["bytes_per_cell_update"] > 0


def test_infeasible_raises():
    p = parse_file(SODA / "jacobi3d.soda")
    with pytest.raises(ValueError, match="does not fit vmem budget"):
        plan(p, (4096, 4096, 4096), vmem_budget=64 * 1024)
    # iterate>1 cannot split the feedback loop across groups
    pj = parse_file(SODA / "jacobi2d.soda")
    with pytest.raises(ValueError, match="no feasible block"):
        plan(pj, (4096, 4096), vmem_budget=64 * 1024)


def _chain3d_src(n_stages=6):
    src = "kernel: chain3d\ninput float: a(64, 64, *)\n"
    prev = "a"
    for i in range(n_stages):
        nm = f"s{i}"
        src += (f"local float: {nm}(0,0,0) = ({prev}(-2,0,0) + {prev}(2,0,0)"
                f" + {prev}(0,-2,0) + {prev}(0,2,0) + {prev}(0,0,-2)"
                f" + {prev}(0,0,2) + {prev}(0,0,0)) * 0.14f\n")
        prev = nm
    src += f"output float: out(0,0,0) = {prev}(0,0,0)\n"
    return src


def test_multi_group_split_under_pressure():
    """Tight VMEM budget forces a deep stage chain into chained kernels."""
    p = parse(_chain3d_src())
    pl = plan(p, (64, 64, 512), vmem_budget=4 * 2**20)
    assert len(pl.groups) > 1
    # every stage appears exactly once across groups
    allst = [s for g in pl.groups for s in g.stages]
    assert sorted(allst) == sorted(p.stage_order())
    # chained: later groups consume earlier groups' outputs
    produced = set(p.input_names)
    for g in pl.groups:
        assert set(g.external_inputs) <= produced
        produced |= set(g.outputs)
    assert set(p.output_names) <= produced


def test_strips_rejects_halo_wider_than_block():
    """A strip halo wider than the block would misalign against the clamp;
    such plans must never be produced (fall back to windows/chunking)."""
    p = parse_file(SODA / "jacobi2d.soda")  # iterate 8, radius 1
    for shape in ((32, 128), (64, 128), (200, 384), (48, 128)):
        pl = plan(p, shape)
        for g in pl.groups:
            if g.strategy != "strips":
                continue
            for i in g.external_inputs:
                for d in range(p.rank - 1):
                    assert g.halo[i][d][0] <= g.block[d]
                    assert g.halo[i][d][1] <= g.block[d]


def test_rank1_plans_and_runs():
    """Round 2: rank-1 programs plan (lane-dim-only block) and run on every
    backend (VERDICT r1 missing #2)."""
    import numpy as np

    from soda_tpu.backend import cpp, pallas as pb, xla as xb
    from soda_tpu.interp import numpy_interp

    p = parse_file(SODA / "smooth1d.soda")
    pl = plan(p, (1024,))
    assert pl.groups[0].block == (1024,)
    assert pl.groups[0].grid == ()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1024,)).astype(np.float32)
    gold = numpy_interp.run(p, {"w_in": x})["w_out"]
    rim = p.valid_rim()
    for got in (pb.run(p, {"w_in": x}, interpret=True)["w_out"],
                xb.run(p, {"w_in": x})["w_out"],
                cpp.compile_and_run(p, {"w_in": x})["w_out"]):
        assert np.allclose(gold[rim:-rim], got[rim:-rim],
                           rtol=1e-5, atol=1e-6)


def test_rank4_plans_and_runs():
    """Rank-general candidate generation: a 4-D program plans and matches
    the oracle (interpret-mode Pallas)."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.frontend.parser import parse
    from soda_tpu.interp import numpy_interp

    src = (
        "kernel: blur4d\n"
        "input float: a(8, 8, 8, *)\n"
        "output float: out(0,0,0,0) = (a(-1,0,0,0) + a(0,-1,0,0)"
        " + a(0,0,-1,0) + a(0,0,0,-1) + a(0,0,0,1) + a(0,0,1,0)"
        " + a(0,1,0,0) + a(1,0,0,0) + a(0,0,0,0)) / 9.0f\n"
    )
    p = parse(src)
    gshape = (16, 16, 16, 128)
    pl = plan(p, gshape)
    assert len(pl.groups[0].block) == 4
    rng = np.random.default_rng(4)
    x = rng.standard_normal(gshape).astype(np.float32)
    gold = numpy_interp.run(p, {"a": x})["out"]
    got = pb.run(p, {"a": x}, interpret=True)["out"]
    r = p.valid_rim()
    sl = tuple(slice(r, -r) for _ in range(4))
    assert np.allclose(gold[sl], got[sl], rtol=1e-5, atol=1e-6)


def test_unaligned_grid_keeps_padfree_strategy():
    """Round 2 (VERDICT #5): non-8-aligned grids keep strips/linebuffer via
    the aligned-core + XLA-rim hybrid instead of falling back to padded
    windows; analytic traffic stays near the roofline."""
    p = parse_file(SODA / "jacobi3d.soda")
    pl = plan(p, (500, 500, 500))
    g = pl.groups[0]
    assert g.strategy == "linebuffer"
    assert g.core == (496, 496, 500)
    bpc = g.hbm_bytes_per_call / g.useful_cells_per_call
    assert bpc <= 8.5  # the VERDICT's done-criterion

    p2 = parse_file(SODA / "gaussian2d.soda")
    pl2 = plan(p2, (100, 128))
    # any pad-free strategy (the 2-D linebuffer now beats strips here),
    # but NOT the padded-windows fallback
    assert pl2.groups[0].strategy in ("strips", "linebuffer")
    assert pl2.groups[0].core == (96, 128)


def test_hybrid_rim_matches_oracle():
    """Aligned-core hybrid correctness on unaligned grids: linebuffer 3D,
    strips 2D (uint16, bit-exact), and fused-sweep strips."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.interp import numpy_interp

    rng = np.random.default_rng(11)

    p = parse_file(SODA / "jacobi3d.soda")
    gs = (28, 37, 130)
    assert plan(p, gs).groups[0].core is not None
    x = rng.standard_normal(gs).astype(np.float32)
    gold = numpy_interp.run(p, {"t0": x})["t1"]
    got = pb.run(p, {"t0": x}, interpret=True)["t1"]
    r = p.valid_rim()
    sl = tuple(slice(r, -r) for _ in range(3))
    assert np.allclose(gold[sl], got[sl], rtol=1e-5, atol=1e-6)

    p2 = parse_file(SODA / "gaussian2d.soda")
    gs2 = (100, 128)
    y = rng.integers(0, 60000, gs2).astype(np.uint16)
    gold2 = numpy_interp.run(p2, {"g_in": y})["g_out"]
    got2 = pb.run(p2, {"g_in": y}, interpret=True)["g_out"]
    r2 = p2.valid_rim()
    sl2 = (slice(r2, -r2), slice(r2, -r2))
    assert np.array_equal(gold2[sl2], got2[sl2])

    p3 = parse_file(SODA / "jacobi2d.soda")
    gs3 = (100, 128)
    pl3 = plan(p3, gs3, sweeps=4)
    assert pl3.groups[0].core is not None and pl3.groups[0].sweeps == 4
    z = rng.standard_normal(gs3).astype(np.float32)
    name_in, name_out = p3.input_names[0], p3.output_names[0]
    gold3 = numpy_interp.run(p3, {name_in: z})[name_out]
    got3 = pb.run(p3, {name_in: z}, interpret=True, the_plan=pl3)[name_out]
    r3 = p3.valid_rim()
    sl3 = (slice(r3, -r3), slice(r3, -r3))
    assert np.allclose(gold3[sl3], got3[sl3], rtol=1e-4, atol=1e-5)


def test_trapezoid_cuts_compute_waste():
    """Round 2 (VERDICT #6): fused sweeps <= 8 run the trapezoid schedule;
    compute_extent_ratio drops from the constant-extent ~1.25-1.6x to
    within a few % of 1.0."""
    p = parse_file(SODA / "jacobi2d.soda")
    pl = plan(p, (1024, 1024), sweeps=8)
    g = pl.groups[0]
    assert g.trapezoid
    assert g.compute_extent_ratio < 1.1


def test_deep_trapezoid_auto_pick_hbm_bound():
    """Round 2 (TODO 'trapezoid beyond 8'): with TRAPEZOID_MAX_SWEEPS=16,
    an HBM-bound cheap stencil auto-picks 16 fused trapezoid sweeps
    (halving traffic vs 8x2 chunks), while VPU-bound programs still pick
    8; a 16-sweep trapezoid execution matches the oracle.

    Hardware-measured Mosaic compile at depth 16 is ~1-2 min (see
    TRAPEZOID_MAX_SWEEPS comment) and the plan notes say so."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.interp import numpy_interp

    src = ("kernel: cheap16\niterate: 16\ninput float: a(1024, *)\n"
           "output float: b(0,0) = (a(0,-1) + a(0,1)) * 0.5f\n")
    p = parse(src)
    pl = plan(p, (4096, 4096))
    g = pl.groups[0]
    assert g.sweeps == 16 and g.trapezoid
    assert any("deep trapezoid" in n for n in pl.notes)
    # correctness of the 16-deep shrinking-extent schedule
    pl_small = plan(p, (256, 256), sweeps=16)
    assert pl_small.groups[0].trapezoid
    x = np.random.default_rng(5).standard_normal((256, 256)).astype(np.float32)
    gold = numpy_interp.run(p, {"a": x})["b"]
    got = pb.run(p, {"a": x}, interpret=True, the_plan=pl_small)["b"]
    r = p.valid_rim()
    assert np.allclose(gold[r:-r, r:-r], got[r:-r, r:-r],
                       rtol=1e-5, atol=1e-5)


def test_aux_input_iterate_backends():
    """iterate with an auxiliary input: pallas (trapezoid) and xla match
    the oracle; fused sweeps capped at the trapezoid limit."""
    import numpy as np

    from soda_tpu.backend import pallas as pb, xla as xb
    from soda_tpu.interp import numpy_interp

    p = parse_file(SODA / "denoise2p.soda")
    gs = (128, 128)
    g = plan(p, gs).groups[0]
    assert g.trapezoid and set(g.external_inputs) == {"u", "f"}
    rng2 = __import__("numpy").random.default_rng(9)
    u = rng2.standard_normal(gs).astype(np.float32)
    f = rng2.standard_normal(gs).astype(np.float32)
    gold = numpy_interp.run(p, {"u": u, "f": f})["u1"]
    r = p.valid_rim()
    sl = (slice(r, -r), slice(r, -r))
    for got in (pb.run(p, {"u": u, "f": f}, interpret=True)["u1"],
                xb.run(p, {"u": u, "f": f})["u1"]):
        assert np.allclose(gold[sl], got[sl], rtol=1e-4, atol=1e-5)


def test_linebuffer_2d_selected_and_matches():
    """Round 2 (VERDICT #8): the 2-D row-march line buffer — selected when
    it beats strips, one HBM read per cell, exact vs the oracle (the
    round-1 probe that hung Mosaic used unaligned sublane concats; this
    one is sublane-quantum aligned throughout and compiles in <1s on v5e)."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.interp import numpy_interp

    rng2 = np.random.default_rng(17)
    p = parse_file(SODA / "gaussian2d.soda")
    gs = (1024, 512)
    pl = plan(p, gs)
    g = pl.groups[0]
    assert g.strategy == "linebuffer" and len(g.block) == 2
    bpc = g.hbm_bytes_per_call / g.useful_cells_per_call
    assert bpc <= 4.05  # one u16 read + one u16 write + march overhead
    x = rng2.integers(0, 60000, gs).astype(np.uint16)
    gold = numpy_interp.run(p, {"g_in": x})["g_out"]
    got = pb.run(p, {"g_in": x}, interpret=True, the_plan=pl)["g_out"]
    r = p.valid_rim()
    sl = (slice(r, -r), slice(r, -r))
    assert np.array_equal(gold[sl], got[sl])

    # hybrid core: unaligned H keeps the 2-D linebuffer via the rim pass
    p2 = parse_file(SODA / "blur.soda")
    gs2 = (1000, 512)
    pl2 = plan(p2, gs2)
    if pl2.groups[0].strategy == "linebuffer":
        assert pl2.groups[0].core is not None
    y = rng2.integers(0, 250, gs2).astype(np.uint16)
    gold2 = numpy_interp.run(p2, {"input": y})["blur_y"]
    got2 = pb.run(p2, {"input": y}, interpret=True, the_plan=pl2)["blur_y"]
    r2 = p2.valid_rim()
    sl2 = (slice(r2, -r2), slice(r2, -r2))
    assert np.array_equal(gold2[sl2], got2[sl2])


def test_auto_sweep_selection_deep_iterate():
    """Round 2: auto fused-sweep choice scores every divisor of iterate by
    the modeled min(HBM, VPU) bound — deep-iterate programs pick a shallow
    trapezoid x chunks over the VPU-wasteful maximal fori fusion."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.interp import numpy_interp

    src = (
        "kernel: deep\niterate: 64\ninput float: a(1024, *)\n"
        "output float: b(0,0) = (a(-1,0) + a(1,0) + a(0,-1) + a(0,1)"
        " + a(0,0)) * 0.2f\n"
    )
    p = parse(src)
    pl = plan(p, (2048, 2048))
    g = pl.groups[0]
    assert g.sweeps == 8 and g.trapezoid
    assert any("auto sweeps" in n for n in pl.notes)
    # explicit sweeps still honored
    pl2 = plan(p, (2048, 2048), sweeps=64)
    assert pl2.groups[0].sweeps == 64
    # correctness of the chunked-trapezoid execution
    x = np.random.default_rng(2).standard_normal((256, 256)).astype(np.float32)
    gold = numpy_interp.run(p, {"a": x})["b"]
    got = pb.run(p, {"a": x}, interpret=True)["b"]
    r = p.valid_rim()
    assert np.allclose(gold[r:-r, r:-r], got[r:-r, r:-r],
                       rtol=1e-3, atol=1e-3)


def test_rank1_uint16_lifts_and_runs():
    """Heavy-fuzz finding: rank-1 uint16 programs lift to (1, X) whose
    16-row minimum block exceeded the 8-rounded size guard — the guard now
    rounds by the dtype quantum."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.interp import numpy_interp

    src = (
        "kernel: r1u16\ninput uint16: a(*)\n"
        "local uint16: s0(0) = a(-2) + a(2)\n"
        "output uint16: out(0) = s0(-1) + a(0) * 2 + s0(1)\n"
    )
    p = parse(src)
    x = np.random.default_rng(5).integers(0, 200, (300,)).astype(np.uint16)
    gold = numpy_interp.run(p, {"a": x})["out"]
    got = pb.run(p, {"a": x}, interpret=True)["out"]
    r = p.valid_rim()
    assert np.array_equal(gold[r:-r], got[r:-r])


def test_auto_sweeps_respects_aux_cap():
    """Review r2b: auto sweep selection must not pick a fori-path count for
    aux-input programs (the fori kernel carries only the feedback tensor)."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.interp import numpy_interp

    src = (
        "kernel: dn\niterate: 64\n"
        "input float: u(1024, *)\ninput float: f(1024, *)\n"
        "output float: u1(0,0) = (u(-1,0) + u(1,0) + u(0,-1) + u(0,1)"
        " + 0.5f * f(0,0)) / 4.5f\n"
    )
    p = parse(src)
    pl = plan(p, (512, 512))
    g = pl.groups[0]
    from soda_tpu.plan.planner import TRAPEZOID_MAX_SWEEPS
    assert g.sweeps <= TRAPEZOID_MAX_SWEEPS and g.trapezoid
    x = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
    f = np.random.default_rng(1).standard_normal((128, 128)).astype(np.float32)
    out = pb.run(p, {"u": x, "f": f}, interpret=True)["u1"]  # must not raise
    assert out.shape == x.shape


def test_user_tensor_named_like_cse_goes_wide():
    """Review r2b, updated for the in-kernel wide mode: the synthetic-stage
    exemption is a Tensor FLAG, not a name-substring test — USER tensors
    named *__cse* trigger the (8 B/elem, pair-carrier) wide path, while
    truly synthetic int64 partial sums keep the fast 32-bit path."""
    from soda_tpu.interp.wide64 import program_is_wide

    src = ("kernel: w\ninput int64: a__cse1(64, *)\n"
           "output int64: out(0,0) = a__cse1(0,0) + a__cse1(0,1)\n")
    p = parse(src)
    assert program_is_wide(p)  # user-declared despite the __cse name
    pl = plan(p, (64, 128))
    assert pl.groups[0].strategy == "windows"
    assert any("paired-32-bit" in n for n in pl.notes)


def test_trapezoid_mixed_sign_multistage_chain():
    """Fuzz seed 141 regression (code-review round): mixed-sign MULTI-STAGE
    chains under the trapezoid schedule need per-sweep creep = the UNION
    of chain creep and every input's composed span — the chain creep's
    zero-fill 'escape' semantics only applies to the constant-extent fori
    path.  With the composed-output-span creep, a stage tapping +1 whose
    consumer taps -2 under-provisioned the next sweep's feedback slice by
    one row per sweep (silently clamped -> shape error or wrong values)."""
    import numpy as np

    from soda_tpu.backend import pallas as pb
    from soda_tpu.interp import numpy_interp

    src = ("kernel: fw\niterate: 2\ninput int32: a(64, *)\n"
           "local int32: s0(0, 0) = a(1, 2) + a(-2, -1)"
           " + (a(-1, -2) >> 11) + a(0, 2) * 1\n"
           "local int32: s1(0, 0) = s0(-2, -2) + s0(-1, 2)"
           " + s0(-2, 0) * 4\n"
           "output int32: out(0, 0) = (s1(-1, 0) & 343597) + s1(-2, 2)\n")
    p = parse(src)
    g = plan(p, (40, 128)).groups[0]
    assert g.trapezoid
    # the per-sweep creep must cover the input's +1 composed-span side
    assert g.sweep_span[0][1] >= 1
    x = np.random.default_rng(1).integers(-2**27, 2**27,
                                          (40, 128)).astype(np.int32)
    gold = numpy_interp.run(p, {"a": x})["out"]
    got = pb.run(p, {"a": x}, interpret=True)["out"]
    r = p.valid_rim()
    assert np.array_equal(gold[r:-r, r:-r], got[r:-r, r:-r])


def test_wide_per_op_vpu_weights_drive_sweep_selection():
    """VERDICT r2 #5: the wide VPU bound is walked per op (div 35, mul 17,
    add 20 for double-single pairs; 512 for int pair long division), not a
    blended multiplier — a division-heavy double program is modeled
    costlier and the auto-sweep selector provably fuses shallower than the
    same-shape multiply variant."""
    from soda_tpu.frontend.parser import parse
    from soda_tpu.utils.opcount import expr_ops_wide, ops_per_cell

    src = ("kernel: w{0}\niterate: 16\ninput double: a(256, *)\n"
           "output double: out(0,0) = (a(-1,0) + a(1,0)) {1} a(0,1)\n")
    p_div = parse(src.format("div", "/"))
    p_mul = parse(src.format("mul", "*"))
    assert ops_per_cell(p_div) > ops_per_cell(p_mul)
    nf_div = plan(p_div, (1024, 1024)).groups[0].sweeps
    nf_mul = plan(p_mul, (1024, 1024)).groups[0].sweeps
    assert nf_div < nf_mul  # 2 vs 4 at these shapes

    # int pair long division dominates everything else in the model
    p_idiv = parse("kernel: wi\ninput int64: a(256, *)\n"
                   "output int64: out(0,0) = a(0,1) / a(0,-1)\n")
    t = p_idiv.tensors["out"]
    assert expr_ops_wide(t.expr, p_idiv) >= 512
    # ... but a constant power-of-two divisor is shift-optimized
    p_pow2 = parse("kernel: wp\ninput int64: a(256, *)\n"
                   "output int64: out(0,0) = a(0,1) / 8\n")
    assert expr_ops_wide(p_pow2.tensors["out"].expr, p_pow2) < 20
