"""Chebyshev-preconditioned BiCGSTAB: true-residual tolerance semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
from eddy_currents_3d_tpu.assembly.stencil import State
from eddy_currents_3d_tpu.solvers.bicgstab import bicgstab_wr
from eddy_currents_3d_tpu.solvers.chebyshev import bicgstab_wr_cheb
from eddy_currents_3d_tpu.sim.simulate import Simulation
from eddy_currents_3d_tpu.testing.cases import case_static, load_case


def _system(rng=None):
    """The *actual* second-step RHS of a physical case.  Random right-hand
    sides (even with div-structured U rows) excite coupled modes on which
    the reference's unpreconditioned recurrence itself breaks down (NaN);
    the solver only ever sees physical RHS in the time loop."""
    model = load_case(case_static(shape_xyz=(16, 16, 12), steps=2))
    model.solver.itmax = -1  # solver no-ops: the step returns rhs in carry
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64,
                     donate=False)
    st0 = sim.init_state()
    st1, _ = sim._step(st0, 0.0)
    cond = np.asarray(sim.system.cond_mask)
    rhs_A = jnp.asarray(np.where(cond[None], -np.asarray(st1.carry),
                                 np.asarray(st1.carry)))
    sysm = sim.system
    b = State(rhs_A, sysm.op.apply_div(st1.A * 0.0))  # U rows are 0 at step 1
    model.solver.itmax = 10000
    return model, sysm, b


def test_true_residual_tolerance(rng):
    model, sysm, b = _system(rng)
    tol = 1e-4
    lmax = sysm.gershgorin * 1.01
    x0 = State(jnp.zeros_like(b.A), jnp.zeros_like(b.U))
    res = bicgstab_wr_cheb(sysm.op.apply, b, x0, tol, 10000,
                           order=4, lmin=lmax / 30, lmax=lmax,
                           dot_dtype=jnp.float64)
    assert bool(res.converged)
    r = (b - sysm.op.apply(res.x))
    true_rel = float(r.norm() / b.norm())
    assert true_rel < tol
    # reported relres is expressed against ||b|| (matches the true residual
    # up to preconditioned-recurrence drift)
    assert float(res.relres) < tol


def test_fewer_iterations_than_plain(rng):
    model, sysm, b = _system(rng)
    x0 = State(jnp.zeros_like(b.A), jnp.zeros_like(b.U))
    plain = bicgstab_wr(sysm.op.apply, b, x0, 1e-5, 10000, dot_dtype=jnp.float64)
    lmax = sysm.gershgorin * 1.01
    cheb = bicgstab_wr_cheb(sysm.op.apply, b, x0, 1e-5, 10000,
                            order=4, lmin=lmax / 30, lmax=lmax,
                            dot_dtype=jnp.float64)
    assert int(cheb.iterations) < int(plain.iterations)


def test_warm_start_already_converged(rng):
    model, sysm, b = _system(rng)
    x0 = State(jnp.zeros_like(b.A), jnp.zeros_like(b.U))
    lmax = sysm.gershgorin * 1.01
    first = bicgstab_wr_cheb(sysm.op.apply, b, x0, 1e-6, 10000,
                             order=4, lmin=lmax / 30, lmax=lmax,
                             dot_dtype=jnp.float64)
    again = bicgstab_wr_cheb(sysm.op.apply, b, first.x, 1e-4, 10000,
                             order=4, lmin=lmax / 30, lmax=lmax,
                             dot_dtype=jnp.float64)
    assert int(again.iterations) == 0
    np.testing.assert_array_equal(np.asarray(again.x.A), np.asarray(first.x.A))


def test_simulation_with_cheb_matches_plain():
    model = load_case(case_static(shape_xyz=(16, 16, 12), steps=3))
    plain_state, plain_diag = Simulation(model, dtype=jnp.float64,
                                         dot_dtype=jnp.float64).run()
    cheb_state, cheb_diag = Simulation(model, dtype=jnp.float64,
                                       dot_dtype=jnp.float64,
                                       precond="cheb").run()
    assert not cheb_diag["unconverged_steps"]
    assert cheb_diag["total_iterations"] < plain_diag["total_iterations"]
    # both converge the same systems to the same tolerance: fields agree to
    # a few x tol
    scale = np.abs(np.asarray(plain_state.A)).max()
    np.testing.assert_allclose(np.asarray(cheb_state.A), np.asarray(plain_state.A),
                               atol=2 * model.solver.tolerance * scale)


def test_gershgorin_is_a_spectral_bound(rng):
    model, sysm, b = _system(rng)
    # power-iterate the operator; Gershgorin must dominate
    v = b
    for _ in range(30):
        w = sysm.op.apply(v)
        n = float(w.norm())
        v = w.scale(1.0 / n)
    lam = float(sysm.op.apply(v).dot(v) / v.dot(v))
    assert lam <= sysm.gershgorin * (1 + 1e-6)
    assert lam >= 0.2 * sysm.gershgorin  # and it is reasonably tight
