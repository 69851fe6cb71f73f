"""Native C++ VTK encoder vs the numpy writers: byte-identical files."""

import os

import numpy as np
import pytest

from eddy_currents_3d_tpu.io import native as native_io
from eddy_currents_3d_tpu.io.vtk import EDDY_SCALE, write_field, write_src


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_field_bytes_identical(tmp_path, rng, lib):
    nz, ny, nx = 6, 13, 17
    A = rng.standard_normal((3, nz, ny, nx))
    carry = rng.standard_normal((3, nz, ny, nx))
    cond = np.zeros((nz, ny, nx), bool)
    cond[2:4, 3:7, 4:9] = True
    delta = (0.0123, 0.045, 0.0067)

    p_np = str(tmp_path / "np.vtk")
    p_cc = str(tmp_path / "cc.vtk")
    write_field(p_np, delta, A, carry, cond)
    assert native_io.write_field_native(p_cc, delta, A, carry, cond, EDDY_SCALE)
    assert open(p_np, "rb").read() == open(p_cc, "rb").read()


def test_field_no_conductors(tmp_path, rng, lib):
    A = rng.standard_normal((3, 4, 5, 6))
    write_field(str(tmp_path / "np.vtk"), (1, 1, 1), A, A * 2, None)
    assert native_io.write_field_native(str(tmp_path / "cc.vtk"), (1, 1, 1),
                                        A, A * 2, None, EDDY_SCALE)
    assert (tmp_path / "np.vtk").read_bytes() == (tmp_path / "cc.vtk").read_bytes()


def test_field_large_dims_header(tmp_path, rng, lib):
    # multi-digit dims exercise the Fortran-style header spacing
    A = rng.standard_normal((3, 3, 24, 120))
    write_field(str(tmp_path / "np.vtk"), (1e-3, 2e-3, 3e-3), A, A, None)
    assert native_io.write_field_native(str(tmp_path / "cc.vtk"),
                                        (1e-3, 2e-3, 3e-3), A, A, None, EDDY_SCALE)
    assert (tmp_path / "np.vtk").read_bytes() == (tmp_path / "cc.vtk").read_bytes()


def test_src_bytes_identical(tmp_path, lib):
    shape_xyz = (10, 8, 6)
    cells = [np.array([3 + 10 * 2 + 80, 4 + 10 * 2 + 80]), np.array([5 + 40 + 160])]
    vals = [2.5, -1.5]
    dirs = ["X", "Z"]
    delta = (0.1, 0.2, 0.3)
    write_src(str(tmp_path / "np.vtk"), delta, shape_xyz, cells, vals, dirs)
    assert native_io.write_src_native(str(tmp_path / "cc.vtk"), delta, shape_xyz,
                                      cells, vals, dirs)
    assert (tmp_path / "np.vtk").read_bytes() == (tmp_path / "cc.vtk").read_bytes()


def test_sim_output_path_uses_native(tmp_path, monkeypatch, lib):
    import jax.numpy as jnp
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    model = load_case(case_static(shape_xyz=(12, 12, 10), steps=3, jump=0.001))
    sim = Simulation(model, dtype=jnp.float64)
    out_native = tmp_path / "nat"
    sim.run(output_dir=str(out_native))
    monkeypatch.setenv("EC3D_NATIVE_IO", "0")
    sim2 = Simulation(model, dtype=jnp.float64)
    out_np = tmp_path / "np"
    sim2.run(output_dir=str(out_np))
    for name in os.listdir(out_np):
        assert (out_native / name).read_bytes() == (out_np / name).read_bytes(), name
