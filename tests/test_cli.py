"""CLI tests: drive sodac's main() in-process (CPU platform via conftest).

Mirrors the reference's CLI surface checks (flag precedence, artifact
emission) — SURVEY.md §2.1 L1."""

import json
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from soda_tpu.cli.sodac import main

SODA = pathlib.Path(__file__).parent / "soda"


def test_report(capsys):
    rc = main([str(SODA / "jacobi3d.soda"), "--grid-shape", "64,64,128",
               "--report"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "compile report: jacobi3d" in out
    assert "B/cell-update" in out
    assert "roofline" in out


def test_dump_plan_json(capsys, tmp_path):
    f = tmp_path / "plan.json"
    rc = main([str(SODA / "blur.soda"), "--grid-shape", "64,128",
               "--dump-plan", str(f)])
    assert rc == 0
    j = json.loads(f.read_text())
    assert j["program"] == "blur"
    assert j["groups"][0]["stages"] == ["blur_x", "blur_y"]


def test_run_interpret_verifies(capsys):
    rc = main([str(SODA / "blur.soda"), "--grid-shape", "48,128",
               "--run", "--interpret"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "verification vs NumPy oracle: PASS" in out


def test_run_xla_backend(capsys):
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "32,64",
               "--run", "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out


def test_mesh_run(capsys):
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "64,64",
               "--run", "--mesh", "8"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out


def test_mesh_run_named_axes_dcn(capsys):
    """Named mesh axes with a DCN slice axis + per-axis exchange cadence."""
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "64,64",
               "--run", "--mesh", "dcn:2,x:4",
               "--sweeps-per-exchange", "4,2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out


def test_mesh_run_named_axes_auto_cadence(capsys):
    """DCN axis with no explicit cadence: modeled auto choice."""
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "64,64",
               "--run", "--mesh", "dcn:2,x:4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out


def test_cli_override_beats_dsl(capsys, tmp_path):
    f = tmp_path / "plan.json"
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "64,64",
               "--iterate", "2", "--dump-plan", str(f)])
    assert rc == 0
    j = json.loads(f.read_text())
    assert j["groups"][0]["sweeps"] == 2  # DSL said 8; CLI wins


def test_tcse_flag(capsys, tmp_path):
    f = tmp_path / "plan.json"
    rc = main([str(SODA / "seidel2d.soda"), "--grid-shape", "64,128",
               "--tcse", "--dump-plan", str(f)])
    assert rc == 0
    j = json.loads(f.read_text())
    assert any("__cse" in s for s in j["groups"][0]["stages"])


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_xocl_compat_artifacts_compile(tmp_path):
    k = tmp_path / "kernel.cpp"
    h = tmp_path / "header.h"
    rc = main([str(SODA / "blur.soda"), "--grid-shape", "24,32",
               "--xocl-kernel", str(k), "--xocl-header", str(h)])
    assert rc == 0
    assert "SODA_VALID_RIM" in h.read_text()
    subprocess.run(["g++", "-O2", "-std=c++17", "-o", str(tmp_path / "x"),
                    str(k)], check=True, capture_output=True)


def test_rank_mismatch_exits_nonzero():
    with pytest.raises(SystemExit):
        main([str(SODA / "jacobi3d.soda"), "--grid-shape", "64,64",
              "--report"])


def test_grid_shape_from_tile_size(capsys, tmp_path):
    # no --grid-shape: derived from the input tile size ('*' -> 512)
    f = tmp_path / "plan.json"
    rc = main([str(SODA / "blur.soda"), "--dump-plan", str(f)])
    assert rc == 0
    j = json.loads(f.read_text())
    assert j["grid_shape"] == [2000, 512]


def test_compile_cache_flag(tmp_path, capsys):
    cache = tmp_path / "cache"
    rc = main([str(SODA / "blur.soda"), "--grid-shape", "48,128",
               "--run", "--interpret", "--compile-cache", str(cache)])
    assert rc == 0
    assert "PASS" in capsys.readouterr().out
    assert cache.exists() and any(cache.iterdir())  # cache populated


def test_mesh_local_backend_and_overlap_flags():
    """--mesh-local-backend pallas + --mesh-overlap route through the
    per-shard Pallas kernels and the comms/compute-overlap path (the
    conftest's 8-device CPU sim; interpret mode)."""
    rc = main([
        str(SODA / "jacobi2d.soda"), "--grid-shape", "64,128",
        "--mesh", "4", "--mesh-local-backend", "pallas", "--interpret",
        "--mesh-overlap", "--run"])
    assert rc == 0


def test_lb_engine_ep_report(capsys):
    """--lb-engine ep: the march reads each cell once, so the headline
    config reports exactly the ideal (100.0% of roofline); the engine
    override is restored afterwards (set before planning, cleared here)."""
    from soda_tpu.utils import config

    try:
        rc = main([str(SODA / "jacobi3d.soda"), "--grid-shape",
                   "64,64,128", "--report", "--lb-engine", "ep"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "8.000 B/cell-update" in out
        assert "100.0%" in out
    finally:
        config.set_lb_engine(None)


def test_host_tile_run_and_report(capsys):
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "60,180",
               "--host-tile", "40,64", "--interpret", "--run", "--report"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "host tiling: 2x3 tiles of 40x64" in out
    assert "read amplification" in out
    assert "PASS" in out


def test_host_tile_mesh_report(capsys):
    # report-only (no run): the mesh-composed tile line models the ICI
    # exchange traffic and the per-shard shape
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "60,180",
               "--host-tile", "40,64", "--mesh", "2", "--report"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "mesh per tile: shards of" in out
    assert "ICI halo exchange" in out
    assert "/device/pass" in out  # KiB at this tile size, MiB at scale


def test_host_tile_sweeps_auto(capsys):
    # 'auto' cadence resolves to a divisor of iterate and still passes
    # the oracle; joint with auto tiles
    rc = main([str(SODA / "jacobi2d.soda"), "--grid-shape", "48,256",
               "--host-tile", "auto", "--hbm-budget", str(600 * 2**10),
               "--host-tile-sweeps", "auto", "--interpret", "--run",
               "--report"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "host tiling:" in out
    assert "PASS" in out


def test_host_tile_auto(capsys):
    # budget small enough to force tiling of the 64-row dim
    rc = main([str(SODA / "blur.soda"), "--grid-shape", "64,128",
               "--host-tile", "auto", "--hbm-budget", str(40 * 2**10),
               "--interpret", "--run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out
