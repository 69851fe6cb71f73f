"""Assembly correctness: the vectorized stencil assembler must reproduce,
value-for-value, an independent per-cell oracle transcription of
gen_sparse_matrix (EC3D.f90:465-1049), and the stencil apply must equal the
CSR matvec."""

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.assembly.assemble import assemble_operator, to_csr, AssemblyError
from eddy_currents_3d_tpu.assembly.stencil import State
from eddy_currents_3d_tpu.testing.cases import (
    case_lim, case_moving, case_static, load_case, make_vxc_text,
)
from oracle import OracleSystem


def _compare(model, rtol=1e-9, atol=1e-12):
    sysm = assemble_operator(model, jnp.float64)
    ours = to_csr(sysm, model)
    oracle, bnd_a, bnd_u = OracleSystem(model).to_scipy()
    assert ours.shape == oracle.shape
    diff = (ours - oracle).tocoo()
    if diff.nnz:
        ref = np.abs(np.asarray(oracle[diff.row, diff.col])).ravel()
        bad = np.abs(diff.data) > atol + rtol * ref
        assert not bad.any(), (
            f"{bad.sum()} mismatched entries; first at "
            f"row={diff.row[bad][0]}, col={diff.col[bad][0]}, "
            f"delta={diff.data[bad][0]}"
        )
    return sysm, oracle, bnd_a, bnd_u


def test_static_case_matches_oracle():
    model = load_case(case_static(shape_xyz=(14, 13, 11), steps=2))
    sysm, oracle, bnd_a, bnd_u = _compare(model)
    # boundary-row bookkeeping matches too
    ours_bnd = [np.flatnonzero(np.asarray(sysm.bnd_a[c]).ravel()) + 1 + c * model.n_cells
                for c in range(3)]
    for mine, ref in zip(ours_bnd, bnd_a):
        assert sorted(mine.tolist()) == sorted(ref)
    cn = model.cond_number.ravel()
    for c in range(3):
        mine = sorted((3 * model.n_cells + cn[np.flatnonzero(np.asarray(sysm.bnd_u[c]).ravel())]).tolist())
        assert mine == sorted(bnd_u[c])


def test_lim_case_matches_oracle():
    model = load_case(case_lim(shape_xyz=(24, 11, 10), steps=2))
    _compare(model)


def test_anisotropic_delta_and_bnd():
    # different spacings per axis + non-default BND values
    geo = np.zeros((9, 12, 15), np.int64)
    geo[3:6, 4:9, 4:11] = 1
    names = [
        "cu D=1 C='mu0*20e6' VEX='mu0*20e6*12' VEY='mu0*20e6*-5'",
        "param tran stop=2m step=1m",
        "p2 solver tol=5m itmax=100 dir=o",
        "bb boundary bxm=-0.5 bxp=-0.6 bym=-0.7 byp=-0.8 bzm=-0.9 bzp=-1.0",
    ]
    text = make_vxc_text((15, 12, 9), 0.002, names, geo.ravel())
    text = text.replace("<Y_Dim_Adj>1<", "<Y_Dim_Adj>1.5<").replace(
        "<Z_Dim_Adj>1<", "<Z_Dim_Adj>0.75<"
    )
    model = load_case(text)
    assert model.delta[1] == pytest.approx(0.003)
    _compare(model)


def test_conductor_with_notch_matches_oracle():
    # a conductor with a notch exercises edge/corner U-row cases; every
    # surface cell keeps >=2 conducting cells behind it (one-sided stencils)
    geo = np.zeros((10, 12, 14), np.int64)
    geo[2:7, 2:10, 2:12] = 1
    geo[5:7, 5:7, 6:8] = 0       # notch from the top
    names = [
        "cu D=1 C='mu0*30e6'",
        "param tran stop=2m step=1m",
        "p2 solver tol=5m itmax=100 dir=o",
    ]
    model = load_case(make_vxc_text((14, 12, 10), 0.002, names, geo.ravel()))
    _compare(model)


def test_two_conducting_domains():
    geo = np.zeros((9, 10, 16), np.int64)
    geo[2:6, 3:7, 3:7] = 1
    geo[2:6, 3:7, 9:13] = 2
    names = [
        "cua D=1 C='mu0*30e6'",
        "cub D=2 C='mu0*10e6'",
        "param tran stop=2m step=1m",
        "p2 solver tol=5m itmax=100 dir=o",
    ]
    model = load_case(make_vxc_text((16, 10, 9), 0.002, names, geo.ravel()))
    assert model.n_cond == int((geo > 0).sum())
    # PHYS_C numbering: domain 1 cells first, then domain 2
    _compare(model)


def test_stencil_apply_equals_csr_matvec(rng):
    model = load_case(case_static(shape_xyz=(12, 12, 10), steps=2))
    sysm = assemble_operator(model, jnp.float64)
    csr = to_csr(sysm, model)
    N = model.n_cells
    nz, ny, nx = model.shape_zyx
    cn = model.cond_number.ravel()

    x = rng.standard_normal(3 * N + model.n_cond)
    # embed into grid state (U masked onto conducting cells)
    A = x[: 3 * N].reshape(3, nz, ny, nx)
    U = np.zeros(N)
    U[cn > 0] = x[3 * N + cn[cn > 0] - 1]
    st = State(jnp.asarray(A), jnp.asarray(U.reshape(nz, ny, nx)))
    y = sysm.op.apply(st)

    y_ref = csr @ x
    np.testing.assert_allclose(np.asarray(y.A).ravel(), y_ref[: 3 * N], rtol=1e-12, atol=1e-9)
    yU = np.asarray(y.U).ravel()
    np.testing.assert_allclose(yU[cn > 0], y_ref[3 * N + cn[cn > 0] - 1], rtol=1e-12, atol=1e-9)
    # non-conducting U outputs stay exactly zero (masked subspace invariant)
    assert np.all(yU[cn == 0] == 0.0)


def test_thin_conductor_raises():
    geo = np.zeros((8, 10, 10), np.int64)
    geo[3:5, 3:7, 3:7] = 1  # 2 cells thick in z
    names = ["cu D=1 C='mu0*1e6'", "param tran stop=2m step=1m", "p s solver tol=5m itmax=9 dir=o"]
    model = load_case(make_vxc_text((10, 10, 8), 0.01, names, geo.ravel()))
    with pytest.raises(AssemblyError):
        assemble_operator(model, jnp.float64)


def test_no_conductor_pure_poisson():
    geo = np.zeros((6, 8, 9), np.int64)
    geo[4, 4, 4] = 1
    names = ["coil D=1 SRCx=F1", "param tran stop=2m step=1m", "p2 solver tol=5m itmax=99 dir=o",
             "f1 func F1=a a=1 t=t"]
    model = load_case(make_vxc_text((9, 8, 6), 0.01, names, geo.ravel()))
    sysm, *_ = _compare(model)
    assert model.n_cond == 0
    assert sysm.op.box is None and sysm.op.ku.size == 0


def test_inertia_on_faces_extension():
    """Beyond-reference flag: with inertia_on_faces=True, conducting cells
    on the outer grid faces get the 2C/dt diagonal the reference only adds
    on interior cells (EC3D.f90:656-663); default stays reference-exact."""
    geo = np.zeros((10, 10, 10), np.int64)
    geo[3:7, :, :] = 1          # slab spanning the full x-y cross-section
    names = ["cu D=1 C='mu0*1e6'", "param tran stop=2m step=1m"]
    model = load_case(make_vxc_text((10, 10, 10), 0.01, names, geo.ravel()))
    ref = assemble_operator(model, jnp.float64)
    ext = assemble_operator(model, jnp.float64, inertia_on_faces=True)
    inert = 2.0 * (4e-7 * np.pi * 1e6) / 1e-3
    dref, dext = ref.np_ka[0], ext.np_ka[0]
    # face conducting cell: unchanged in ref, +2C/dt in ext
    assert dext[4, 0, 4] - dref[4, 0, 4] == pytest.approx(inert)
    # interior conducting cell: identical (already had it)
    assert dext[4, 4, 4] == dref[4, 4, 4]
    # air cells: identical
    assert dext[0, 4, 4] == dref[0, 4, 4]


def test_matrix_stats_match_oracle_counts():
    """The CLI's exact matrix-stats print (EC3D.f90:965-971, 1046-1047):
    per-block nnz and boundary-row counts must equal the oracle matrix's
    actual per-row-block entry counts."""
    model = load_case(case_static(shape_xyz=(14, 13, 11), steps=2))
    sysm = assemble_operator(model, jnp.float64)
    st = sysm.matrix_stats()
    oracle, bnd_a, bnd_u = OracleSystem(model).to_scipy()
    N = model.n_cells
    nz = np.asarray(oracle.data) != 0.0
    row_nnz = np.add.reduceat(nz, oracle.indptr[:-1])
    blocks = [int(row_nnz[i * N:(i + 1) * N].sum()) for i in range(3)]
    assert (st["nnz_x"], st["nnz_y"], st["nnz_z"]) == tuple(blocks)
    assert st["nnz_u"] == int(row_nnz[3 * N:].sum())
    assert st["nnz"] == sum(blocks) + st["nnz_u"]
    assert (st["bnd_x"], st["bnd_y"], st["bnd_z"]) == tuple(
        len(b) for b in bnd_a)
    assert st["density_pct"] == pytest.approx(100.0 * st["nnz"] / N / N)
