"""CLI driver (``python -m eddy_currents_3d_tpu``): the reference's
run-an-executable workflow (EC3D.f90:5; in.vxc in the cwd, VTK in the
SOLVER DIR directory)."""

import os

import numpy as np
import pytest

from eddy_currents_3d_tpu.__main__ import main
from eddy_currents_3d_tpu.testing.cases import case_static


@pytest.fixture()
def case_file(tmp_path):
    path = tmp_path / "in.vxc"
    path.write_text(case_static(steps=3, jump=0.001))
    return str(path)


def test_cli_end_to_end(case_file, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main([case_file, "-o", out, "--dtype", "f64"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Tcalc" in text and "unconverged" in text
    # output files at the jump cadence, like the reference (EC3D.f90:436-444)
    assert os.path.exists(os.path.join(out, "field_1.vtk"))
    assert os.path.exists(os.path.join(out, "src_1.vtk"))


def test_cli_defaults_to_solver_dir_and_quiet(case_file, tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([case_file, "-o", "-", "--steps", "2", "-q"])
    assert rc == 0
    assert capsys.readouterr().out == ""


def test_cli_missing_input(tmp_path, capsys):
    rc = main([str(tmp_path / "nope.vxc")])
    assert rc == 2
    assert "not found" in capsys.readouterr().err


def test_cli_scan_outputs_match_host_loop(case_file, tmp_path):
    out1, out2 = str(tmp_path / "loop"), str(tmp_path / "scan")
    assert main([case_file, "-o", out1, "--dtype", "f64", "-q"]) == 0
    assert main([case_file, "-o", out2, "--dtype", "f64", "-q", "--scan"]) == 0
    files = sorted(os.listdir(out1))
    assert files == sorted(os.listdir(out2)) and files
    for f in files:
        with open(os.path.join(out1, f), "rb") as a, \
                open(os.path.join(out2, f), "rb") as b:
            assert a.read() == b.read(), f


def test_cli_shard_mesh_run_matches_single(case_file, tmp_path):
    """--mesh 8 (z-only): the explicit shard_map tier end-to-end."""
    out1, out8 = str(tmp_path / "o1"), str(tmp_path / "oz8")
    assert main([case_file, "-o", out1, "--dtype", "f64", "-q"]) == 0
    assert main([case_file, "-o", out8, "--dtype", "f64", "-q", "--mesh", "8"]) == 0
    from eddy_currents_3d_tpu.io.vtk import read_vtk_vectors

    f1 = read_vtk_vectors(os.path.join(out1, "field_1.vtk"))
    f8 = read_vtk_vectors(os.path.join(out8, "field_1.vtk"))
    for k in f1:
        scale = np.abs(f1[k]).max() or 1.0
        np.testing.assert_allclose(f8[k], f1[k], rtol=1e-7, atol=1e-8 * scale)


def test_cli_mesh_run_matches_single(case_file, tmp_path):
    out1, out8 = str(tmp_path / "o1"), str(tmp_path / "o8")
    assert main([case_file, "-o", out1, "--dtype", "f64", "-q"]) == 0
    assert main([case_file, "-o", out8, "--dtype", "f64", "-q", "--mesh", "4,2"]) == 0
    from eddy_currents_3d_tpu.io.vtk import read_vtk_vectors

    f1 = read_vtk_vectors(os.path.join(out1, "field_1.vtk"))
    f8 = read_vtk_vectors(os.path.join(out8, "field_1.vtk"))
    for k in f1:
        # sharded dots reduce in a different order; fields agree to f64
        # roundoff relative to the field scale
        scale = np.abs(f1[k]).max() or 1.0
        np.testing.assert_allclose(f8[k], f1[k], rtol=1e-7, atol=1e-8 * scale)
