"""End-to-end step semantics vs the oracle numpy loop, plus targeted checks
of each stage of the step (RHS build, post-solve carry)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
from eddy_currents_3d_tpu.sim.simulate import Simulation, _schedule
from eddy_currents_3d_tpu.models.model import TranConfig
from eddy_currents_3d_tpu.testing.cases import case_lim, case_static, load_case
from oracle import OracleSimulator


def test_schedule_matches_reference_bookkeeping():
    # 100 steps at dt=1e-3 to stop=0.1, like compare_to_Elmer (jump unset ->
    # output every step from step index 1)
    steps = _schedule(TranConfig(stop=0.1, step=1e-3, jump=0.0))
    assert len(steps) == 100
    assert steps[0] == (0.0, None)
    assert [o for _, o in steps[1:]] == list(range(1, 100))
    # jump = 10*dt -> outputs at Ntime = 10, 20, ...
    steps = _schedule(TranConfig(stop=0.1, step=1e-3, jump=0.01))
    outs = [i for i, (_, o) in enumerate(steps) if o is not None]
    assert outs == [10, 20, 30, 40, 50, 60, 70, 80, 90]
    # times accumulate exactly like the Fortran loop
    assert steps[3][0] == 1e-3 + 1e-3 + 1e-3


def test_static_simulation_matches_oracle():
    model = load_case(case_static(shape_xyz=(16, 16, 10), steps=3))
    # the oracle loop warm-starts from the previous solution
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64,
                     warm_start="previous")
    st, diag = sim.run()
    Uaf, Jaf, iters_o = OracleSimulator(model).run(3)

    N = model.n_cells
    shape = np.asarray(st.A).shape
    A_o = Uaf[: 3 * N].reshape(shape)
    scale = np.abs(A_o).max()
    assert scale > 0
    np.testing.assert_allclose(np.asarray(st.A), A_o, atol=2e-3 * scale)
    # U solution on conducting cells
    cn = model.cond_number.ravel()
    U_o = np.zeros(N)
    U_o[cn > 0] = Uaf[3 * N + cn[cn > 0] - 1]
    u_scale = max(np.abs(U_o).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(st.U).ravel(), U_o, atol=2e-3 * u_scale)
    # inertial carry (the eddy-current field)
    J_o = Jaf[: 3 * N].reshape(shape)
    np.testing.assert_allclose(np.asarray(st.carry), J_o, atol=2e-3 * np.abs(J_o).max())
    # iteration counts in the same ballpark (identical algorithm, float drift
    # may flip an iteration here or there)
    assert diag["iterations"] == pytest.approx(iters_o, abs=2)


def test_lim_simulation_matches_oracle():
    model = load_case(case_lim(shape_xyz=(24, 11, 10), steps=3))
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64,
                     warm_start="previous")
    st, diag = sim.run()
    Uaf, Jaf, _ = OracleSimulator(model).run(3)
    N = model.n_cells
    A_o = Uaf[: 3 * N].reshape(np.asarray(st.A).shape)
    scale = np.abs(A_o).max()
    np.testing.assert_allclose(np.asarray(st.A), A_o, atol=2e-3 * scale)


def test_first_step_rhs_matches_oracle_exactly():
    """Before any solver drift: the step-1 RHS must match the oracle to
    roundoff."""
    model = load_case(case_static(shape_xyz=(14, 12, 10), steps=2))
    osim = OracleSimulator(model)
    N = model.n_cells

    # oracle RHS at T=0 (statics path: scatter + inertial(0) + U rows(0))
    vals = [float(fn(0.0)) for fn in model.functions]
    Jaf = np.zeros(osim.n)
    for fi, fn in enumerate(model.functions):
        comp = {"X": 0, "Y": 1, "Z": 2}[fn.direction]
        Jaf[comp * N + fn.cells] = vals[fi]
    for b in osim.bnd_u:
        Jaf[b] = 0.0
    for b in osim.bnd_a:
        Jaf[b] = 0.0

    # ours: reach into the jitted step via a zero-itmax solve
    model.solver.itmax = -1  # loop body never runs; x stays x0=0
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64, donate=False)
    st0 = sim.init_state()
    st1, info = sim._step(st0, 0.0)
    # with x=0 the post-solve carry equals -rhs on conducting cells and rhs
    # elsewhere; recover rhs and compare
    cond = np.asarray(sim.system.cond_mask)
    carry = np.asarray(st1.carry)
    rhs = np.where(cond[None], -carry, carry).ravel()
    np.testing.assert_allclose(rhs, Jaf[: 3 * N], rtol=1e-12, atol=1e-9)


def test_convergence_tolerance_honored():
    model = load_case(case_static(shape_xyz=(16, 16, 10), steps=2, tol=1e-4))
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64)
    infos = []
    state = sim.init_state()
    for t, _ in sim.steps:
        state, info = sim._step_jit(state, t)
        infos.append(info)
    for info in infos:
        assert bool(info.converged)
        assert float(info.relres) < 1e-4


def test_float32_converges_to_reference_tolerance():
    """The production dtype (f32 storage/compute) still reaches the
    reference's 5e-3 relative-residual tolerance."""
    model = load_case(case_static(shape_xyz=(16, 16, 10), steps=3, tol=5e-3))
    sim = Simulation(model, dtype=jnp.float32)
    state = sim.init_state()
    for t, _ in sim.steps:
        state, info = sim._step_jit(state, t)
        assert bool(info.converged), float(info.relres)
