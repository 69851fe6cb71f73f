"""ILU(0) preconditioner: native C++ vs numpy factorization, exact-solve
validation, the (LU)_ij == A_ij on-pattern identity, Jacobi-sweep
application, and solver acceleration."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import sparse

from eddy_currents_3d_tpu.ops.sparse import from_scipy
from eddy_currents_3d_tpu.ops.native import ilu0_native, ilu0_solve_native
from eddy_currents_3d_tpu.solvers.bicgstab import bicgstab_wr
from eddy_currents_3d_tpu.solvers.ilu0 import (
    _ilu0_numpy, bicgstab_ilu0, ilu0_factorize, ilu0_solve_exact,
)


def _poisson3d(n=6):
    """7-point Laplacian on an n^3 grid — the structure of the A-blocks."""
    d = sparse.eye(n)
    lap1 = sparse.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (n, n))
    a = (sparse.kron(sparse.kron(lap1, d), d)
         + sparse.kron(sparse.kron(d, lap1), d)
         + sparse.kron(sparse.kron(d, d), lap1))
    return a.tocsr()


def _spd_random(rng, n=40, density=0.1):
    m = sparse.random(n, n, density=density, random_state=np.random.RandomState(5))
    a = (m + m.T).tocsr()
    a.setdiag(np.abs(a).sum(axis=1).A1 + 1.0)   # diagonally dominant
    a.sort_indices()
    return a.tocsr()


def test_native_matches_numpy(rng):
    a = _spd_random(rng)
    indptr = np.asarray(a.indptr, np.int64)
    cols = np.asarray(a.indices, np.int32)
    native = ilu0_native(indptr, cols, a.data)
    if native is None:
        pytest.skip("native sparse engine unavailable")
    np.testing.assert_allclose(native, _ilu0_numpy(indptr, cols, a.data), rtol=1e-13)


def test_lu_product_matches_on_pattern(rng):
    """Defining property of ILU(0): (L@U)_ij == A_ij wherever A_ij is stored."""
    a = _poisson3d(5)
    indptr = np.asarray(a.indptr, np.int64)
    cols = np.asarray(a.indices, np.int32)
    f = ilu0_native(indptr, cols, a.data)
    if f is None:
        f = _ilu0_numpy(indptr, cols, a.data)
    n = a.shape[0]
    L = np.eye(n)
    U = np.zeros((n, n))
    for i in range(n):
        for t in range(indptr[i], indptr[i + 1]):
            (L if cols[t] < i else U)[i, cols[t]] = f[t]
    prod = L @ U
    mask = np.asarray(a.todense() != 0)
    np.testing.assert_allclose(prod[mask], a.toarray()[mask], rtol=1e-10, atol=1e-12)


def test_exact_solve_roundtrip(rng):
    """M^-1 (L U x) == x through the native sequential solver."""
    a = _spd_random(rng, n=35)
    csr = from_scipy(a, jnp.float64)
    x = rng.standard_normal(35)
    M = ilu0_factorize(csr)
    b = np.asarray(M.matvec(jnp.asarray(x)))
    got = ilu0_solve_exact(csr, b)
    np.testing.assert_allclose(got, x, rtol=1e-9)


def test_jacobi_sweeps_converge_to_exact(rng):
    """Enough sweeps reproduce the exact triangular solves (the truncated
    Neumann series is exact once K exceeds the level depth)."""
    a = _spd_random(rng, n=30)
    csr = from_scipy(a, jnp.float64)
    M = ilu0_factorize(csr)
    v = rng.standard_normal(30)
    exact = ilu0_solve_exact(csr, v)
    approx = np.asarray(M.apply(jnp.asarray(v), sweeps=30))
    np.testing.assert_allclose(approx, exact, rtol=1e-9)
    # few sweeps are *not* exact but still a contraction toward it
    few = np.asarray(M.apply(jnp.asarray(v), sweeps=3))
    assert np.linalg.norm(few - exact) < np.linalg.norm(v - exact)


def test_preconditioned_bicgstab_accelerates():
    a = _poisson3d(7)
    csr = from_scipy(a, jnp.float64)
    n = a.shape[0]
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(n))
    x0 = jnp.zeros(n)
    tol = 1e-8

    plain = bicgstab_wr(csr.matvec, b, x0, tol, 2000, dot_dtype=jnp.float64)
    pre = bicgstab_ilu0(csr, b, x0, tol, 2000, sweeps=6, dot_dtype=jnp.float64)

    assert bool(pre.converged)
    np.testing.assert_allclose(
        np.asarray(csr.matvec(pre.x)), np.asarray(b),
        rtol=0, atol=tol * np.linalg.norm(np.asarray(b)) * 10)
    assert int(pre.iterations) < int(plain.iterations)


def test_zero_pivot_raises(rng):
    a = sparse.csr_matrix(np.array([[0.0, 1.0], [1.0, 1.0]]))
    with pytest.raises(ZeroDivisionError):
        ilu0_factorize(from_scipy(a, jnp.float64))


def test_simulation_ilu0_precond_matches():
    """precond='ilu0' wired into Simulation: same converged fields as the
    unpreconditioned solve (both within the 5e-3 residual tolerance)."""
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    model = load_case(case_static(shape_xyz=(14, 14, 12), steps=2))
    ref, rdiag = Simulation(model, dtype=jnp.float64).run()
    ilu, idiag = Simulation(model, dtype=jnp.float64, precond="ilu0").run()
    assert not idiag["unconverged_steps"]
    scale = np.abs(np.asarray(ref.A)).max()
    np.testing.assert_allclose(np.asarray(ilu.A), np.asarray(ref.A),
                               atol=6e-3 * scale)
