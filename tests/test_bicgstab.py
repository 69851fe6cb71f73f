"""BiCGSTABwr solver: algorithmic identity with the reference recurrence
(solvers.f90) and correctness against scipy on general systems."""

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.solvers.bicgstab import bicgstab_wr
from eddy_currents_3d_tpu.solvers.bicgstab import bicgstab_jacobi
from oracle import bicgstab_wr_numpy


def _random_system(rng, n=80, spd_shift=6.0):
    A = rng.standard_normal((n, n)) * 0.3
    A += np.eye(n) * spd_shift
    b = rng.standard_normal(n)
    return A, b


def test_solves_to_tolerance(rng):
    A, b = _random_system(rng)
    res = bicgstab_wr(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                      jnp.zeros_like(jnp.asarray(b)), 1e-8, 500,
                      dot_dtype=jnp.float64)
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-8


def test_matches_numpy_transcription_iterate_for_iterate(rng):
    """With tol=0 both implementations run a fixed number of iterations of
    the same recurrence; iterates must agree to roundoff-amplification."""
    A, b = _random_system(rng, n=40)
    x0 = rng.standard_normal(40) * 0.01
    for itmax in (0, 1, 3):
        x_np, it_np = bicgstab_wr_numpy(A, b, x0, tol=0.0, itmax=itmax)
        res = bicgstab_wr(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                          jnp.asarray(x0), 0.0, itmax, dot_dtype=jnp.float64)
        assert int(res.iterations) == it_np == itmax + 1
        np.testing.assert_allclose(np.asarray(res.x), x_np, rtol=1e-9, atol=1e-12)


def test_zero_rhs_returns_warm_start(rng):
    A, _ = _random_system(rng, n=20)
    x0 = rng.standard_normal(20)
    res = bicgstab_wr(lambda v: jnp.asarray(A) @ v, jnp.zeros(20), jnp.asarray(x0), 1e-6, 100)
    assert int(res.iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.x), x0)


def test_warm_start_reduces_iterations(rng):
    A, b = _random_system(rng)
    apply_fn = lambda v: jnp.asarray(A) @ v
    cold = bicgstab_wr(apply_fn, jnp.asarray(b), jnp.zeros(80), 1e-10, 500, dot_dtype=jnp.float64)
    x_near = np.asarray(cold.x) + 1e-6 * np.random.default_rng(1).standard_normal(80)
    warm = bicgstab_wr(apply_fn, jnp.asarray(b), jnp.asarray(x_near), 1e-10, 500, dot_dtype=jnp.float64)
    assert int(warm.iterations) < int(cold.iterations)


def test_half_step_exit_matches(rng):
    """Pick a tolerance that triggers the ||s||/||b|| half-step exit in the
    numpy transcription; the JAX solver must take the same path."""
    A, b = _random_system(rng, n=30)
    x0 = np.zeros(30)
    # find a tol between consecutive residuals so the half-exit fires
    x_np, it_np = bicgstab_wr_numpy(A, b, x0, tol=1e-5, itmax=200)
    res = bicgstab_wr(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), jnp.asarray(x0),
                      1e-5, 200, dot_dtype=jnp.float64)
    assert int(res.iterations) == it_np
    np.testing.assert_allclose(np.asarray(res.x), x_np, rtol=1e-7, atol=1e-10)


def test_pytree_operands(rng):
    """The solver is generic over pytrees — solve a block system given as a
    dict of two vectors."""
    A, b = _random_system(rng, n=60)

    def apply_fn(v):
        x = jnp.concatenate([v["p"], v["q"]])
        y = jnp.asarray(A) @ x
        return {"p": y[:30], "q": y[30:]}

    bt = {"p": jnp.asarray(b[:30]), "q": jnp.asarray(b[30:])}
    x0 = {"p": jnp.zeros(30), "q": jnp.zeros(30)}
    res = bicgstab_wr(apply_fn, bt, x0, 1e-9, 500, dot_dtype=jnp.float64)
    x = np.concatenate([np.asarray(res.x["p"]), np.asarray(res.x["q"])])
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-9


def test_jacobi_preconditioning_converges_faster(rng):
    n = 120
    # badly scaled but diagonally dominant system
    d = 10.0 ** rng.uniform(0, 3, n)
    A = np.diag(d) + 0.002 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    apply_fn = lambda v: jnp.asarray(A) @ v
    plain = bicgstab_wr(apply_fn, jnp.asarray(b), jnp.zeros(n), 1e-8, 2000, dot_dtype=jnp.float64)
    jac = bicgstab_jacobi(apply_fn, jnp.asarray(np.diag(A)), jnp.asarray(b),
                          jnp.zeros(n), 1e-8, 2000, dot_dtype=jnp.float64)
    xj = np.asarray(jac.x)
    assert np.linalg.norm(b - A @ xj) / np.linalg.norm(b) < 1e-6
    assert int(jac.iterations) <= int(plain.iterations)
