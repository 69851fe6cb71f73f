"""VoxCad reader: parse the reference's three shipped cases (read directly
from the read-only reference mount; skipped when absent) plus synthetic
round trips."""

import os

import numpy as np
import pytest

from eddy_currents_3d_tpu.models.vxc import read_vxc
from eddy_currents_3d_tpu.models.model import MU0
from eddy_currents_3d_tpu.testing.cases import case_static, load_case, make_vxc_text


def test_compare_to_elmer(ref_path):
    m = read_vxc(os.path.join(ref_path, "compare_to_Elmer.vxc"))
    assert m.shape_xyz == (102, 102, 24)
    assert m.delta == pytest.approx([0.00333] * 3)
    assert m.tran.stop == pytest.approx(0.1)
    assert m.tran.step == pytest.approx(1e-3)
    assert m.solver.tolerance == pytest.approx(5e-3)
    assert m.solver.itmax == 10000
    assert m.solver.files == "VEC"     # uppercased by the DSL scanner
    assert m.solver.bound == "DDDDDD"  # default
    # one conducting domain (the plate), sigma*mu0
    cdoms = m.conducting_domains
    assert len(cdoms) == 1
    assert cdoms[0].C == pytest.approx(MU0 * 35.26e6)
    assert m.n_cond == int(np.sum(m.geo == cdoms[0].ident))
    # four source functions: axp/axm (X), ayp/aym (Y)
    assert [f.direction for f in m.functions] == ["X", "X", "Y", "Y"]
    assert all(f.expression is not None for f in m.functions)
    assert all(len(f.cells) > 0 for f in m.functions)
    # source value at t=0: a * mu0 (cos term = 1)
    a = 183 / (6 * m.delta[0] * 6 * m.delta[2])
    assert float(m.functions[0](0.0)) == pytest.approx(a * MU0, rel=1e-9)
    assert float(m.functions[1](0.0)) == pytest.approx(-a * MU0, rel=1e-9)
    assert not any(any(f.move) for f in m.functions)


def test_lim(ref_path):
    m = read_vxc(os.path.join(ref_path, "LIM.vxc"))
    assert m.shape_xyz == (176, 32, 22)
    assert m.tran.stop == pytest.approx(0.2)
    assert m.tran.step == pytest.approx(1e-3)
    assert m.solver.files == "LIM"
    assert len(m.functions) == 12
    # every source slides along x with the same named velocity function
    assert all(f.move == (1, 0, 0) for f in m.functions)
    assert all(f.vmech_index[0] > 0 for f in m.functions)
    assert len(m.vmech) == 12          # one registration per Vsx= occurrence
    assert all(v.expression is not None for v in m.vmech)
    # velocity flips sign with the reciprocation period
    v0 = float(m.vmech[0](0.001))
    v1 = float(m.vmech[0](0.101))
    assert v0 == pytest.approx(-v1)


def test_move_hole(ref_path):
    m = read_vxc(os.path.join(ref_path, "ec_src_move_hole.vxc"))
    assert m.shape_xyz == (102, 102, 24)
    assert m.tran.step == pytest.approx(0.4e-3)
    assert m.tran.stop == pytest.approx(0.04)
    assert len(m.functions) == 4
    assert all(f.move == (1, 1, 0) for f in m.functions)
    assert len(m.vmech) == 8           # Vsx+Vsy registered per source domain
    # moving coil: velocity from m1/m2 FUNC lines
    assert all(v.expression is not None for v in m.vmech)


def test_air_domain_chunking():
    m = load_case(case_static(shape_xyz=(12, 12, 10), steps=1))
    # all zero cells assigned to synthetic AIR domains with D=1
    assert m.nsub_air >= 1
    assert np.all(m.geo > 0)
    air = m.domains[m.nsub]           # first air domain
    assert air.name == "AIR" and air.D == 1.0


def test_zlib_and_ascii_agree(ref_path):
    """Encode the reference geometry as ASCII through our writer and compare
    with the zlib decode path."""
    m = read_vxc(os.path.join(ref_path, "compare_to_Elmer.vxc"))
    # reconstruct pre-air-assignment ids: air domains map back to 0
    geo = np.where(m.geo > m.nsub, 0, m.geo)
    names = ["d1 D=1", "d2 D=1", "d3 D=1", "d4 D=1", "d5 D=1",
             "param tran stop=1m step=1m", "p solver tol=5m itmax=9 dir=o"]
    text = make_vxc_text(m.shape_xyz, 0.00333, names, geo.ravel())
    m2 = load_case(text)
    geo2 = np.where(m2.geo > m2.nsub, 0, m2.geo)
    np.testing.assert_array_equal(geo, geo2)


def test_boundary_line_and_bound_stripping():
    geo = np.zeros((8, 10, 10), np.int64)
    geo[0:8, 2:8, 2:8] = 1            # conductor touching z faces
    names = [
        "cu D=1 C='mu0*1e6'",
        "param tran stop=2m step=1m",
        "p2 solver tol=5m itmax=10 dir=o bound=DDNNDD",
        "bb boundary all=-0.5",
    ]
    m = load_case(make_vxc_text((10, 10, 8), 0.01, names, geo.ravel()))
    assert np.all(m.solver.BND == -0.5)
    assert m.solver.bound == "DDNNDD"
    # with an N face, conducting cells are stripped off every outer boundary
    assert not m.cond_mask[0].any() and not m.cond_mask[-1].any()
    assert m.cond_mask.any()


def test_quoted_constant_expressions():
    geo = np.zeros((6, 6, 6), np.int64)
    geo[2, 2, 2] = 1
    names = [
        "c D='2*pi/6.283185307179586' C='mu0*nx*0'",
        "param tran stop=2m step=1m",
        "p solver tol='5e-3' itmax=7 dir=o",
    ]
    m = load_case(make_vxc_text((6, 6, 6), 0.01, names, geo.ravel()))
    assert m.domains[0].D == pytest.approx(1.0)
    assert m.domains[0].C == 0.0
    assert m.solver.itmax == 7
