"""VTK writers: structure, byte-level formatting, and field content
(reference: utilites.f90:3-293)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.io.vtk import (
    EDDY_SCALE, curl, read_vtk_vectors, write_field, write_src,
)
from eddy_currents_3d_tpu.sim.simulate import Simulation
from eddy_currents_3d_tpu.testing.cases import case_static, load_case


def test_eddy_scale_is_minus_inverse_mu0():
    import math
    # the reference's VTK scale is exactly -1/(4*pi*1e-7) (utilites.f90:239);
    # its MU0 *source* constant is a slightly different (typo'd) value
    # 1.2566370964e-6 (EC3D.f90:254) — both are reproduced faithfully.
    from eddy_currents_3d_tpu.models.model import MU0
    assert EDDY_SCALE == pytest.approx(-1.0 / (4 * math.pi * 1e-7), rel=1e-12)
    assert MU0 == 0.12566370964050292e-5
    assert abs(EDDY_SCALE * MU0 + 1.0) < 1e-7  # differ in the 8th digit


def test_field_file_roundtrip(tmp_path, rng):
    nz, ny, nx = 5, 6, 7
    A = rng.standard_normal((3, nz, ny, nx))
    carry = rng.standard_normal((3, nz, ny, nx))
    cond = np.zeros((nz, ny, nx), bool)
    cond[2:4, 2:4, 2:4] = True
    delta = (0.01, 0.02, 0.03)
    path = str(tmp_path / "field_1.vtk")
    write_field(path, delta, A, carry, cond)

    out = read_vtk_vectors(path)
    assert out["dims"] == (nx, ny, nz)
    grid = lambda V: np.moveaxis(V, 0, -1).reshape(-1, 3)
    np.testing.assert_allclose(out["Field_A"], grid(A), rtol=1e-6)
    eddy = np.where(cond[None], EDDY_SCALE * carry, 0.0)
    np.testing.assert_allclose(out["Vector_field_eddy"], grid(eddy), rtol=2e-6)
    src = np.where(cond[None], 0.0, carry)
    np.testing.assert_allclose(out["Vector_field_SOURCE"], grid(src), rtol=1e-6)
    np.testing.assert_allclose(out["Vector_field_B"], grid(curl(A, delta)), rtol=1e-5, atol=1e-6)


def test_field_header_bytes(tmp_path):
    """Header text must match the Fortran formatting byte for byte
    (trim(adjustl(i8-edits)) keeps internal multi-space runs)."""
    A = np.zeros((3, 2, 3, 4))
    write_field(str(tmp_path / "f.vtk"), (1, 1, 1), A, A, None)
    data = open(tmp_path / "f.vtk", "rb").read()
    assert data.startswith(
        b"# vtk DataFile Version 3.0\nout data result\nBINARY\n"
        b"DATASET STRUCTURED_GRID\nDIMENSIONS 4        3        2\n"
        b"POINTS 24 float\n"
    )
    assert b"VECTORS Field_A float\n" in data
    assert b"VECTORS Vector_field_SOURCE float\n" in data
    assert b"VECTORS Vector_field_eddy float\n" not in data  # no conductors


def test_curl_of_uniform_gradient():
    # A = (0, x, 0) -> curl = (0, 0, 1)
    nz, ny, nx = 6, 6, 8
    dx = 0.5
    x = np.arange(nx) * dx
    A = np.zeros((3, nz, ny, nx))
    A[1] = np.broadcast_to(x, (nz, ny, nx))
    B = curl(A, (dx, 1.0, 1.0))
    # interior exact; clamped edges give half the value (reference behavior)
    assert np.allclose(B[2][:, :, 1:-1], 1.0)
    assert np.allclose(B[2][:, :, 0], 0.5)
    assert np.allclose(B[0], 0) and np.allclose(B[1], 0)


def test_src_file_roundtrip(tmp_path):
    shape_xyz = (10, 8, 6)
    cells_x = np.array([3 + 10 * 2 + 80 * 1, 4 + 10 * 2 + 80 * 1])
    cells_y = np.array([5 + 10 * 4 + 80 * 2])
    path = str(tmp_path / "src_1.vtk")
    write_src(path, (0.1, 0.2, 0.3), shape_xyz,
              [cells_x, cells_y], [2.5, -1.5], ["X", "Y"])
    out = read_vtk_vectors(path)
    assert out["n_points"] == 3 * 8
    np.testing.assert_allclose(
        out["Vector_field_SRC"],
        [[2.5, 0, 0], [2.5, 0, 0], [0, -1.5, 0]],
    )
    # first hexahedron corner = voxel origin (i*dx, j*dy, k*dz)
    np.testing.assert_allclose(out["points"][0], [0.3, 0.4, 0.3])


def test_simulation_writes_outputs(tmp_path):
    model = load_case(case_static(shape_xyz=(12, 12, 10), steps=3, jump=0.001))
    sim = Simulation(model, dtype=jnp.float64)
    sim.run(output_dir=str(tmp_path))
    names = sorted(os.listdir(tmp_path))
    assert names == ["field_1.vtk", "field_2.vtk", "src_1.vtk", "src_2.vtk"]
    out = read_vtk_vectors(str(tmp_path / "field_2.vtk"))
    assert np.abs(out["Vector_field_eddy"]).max() > 0
    assert np.abs(out["Vector_field_SOURCE"]).max() > 0
    src = read_vtk_vectors(str(tmp_path / "src_2.vtk"))
    total_src_cells = sum(len(f.cells) for f in model.functions)
    assert src["n_points"] == 8 * total_src_cells
