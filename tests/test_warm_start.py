"""Extrapolated warm start (Simulation(warm_start="extrapolate"), the
production default): the solver starts from the linear prediction
``2 x_{n-1} - x_{n-2}`` instead of the reference's previous solution
(EC3D.f90:408).  The stopping rule ``||b - A x||/||b|| < tol`` is
unchanged, so converged fields are tolerance-equivalent while total
iterations drop (measured 1.43x on the TEAM7 100-step transient)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.sim.simulate import Simulation
from eddy_currents_3d_tpu.testing.cases import case_static, case_moving, load_case


def test_extrapolate_is_default_and_converges():
    model = load_case(case_static(shape_xyz=(16, 16, 12), steps=4))
    sim = Simulation(model, dtype=jnp.float64)
    assert sim.warm_start == "extrapolate"
    st, diag = sim.run()
    assert not diag["unconverged_steps"]
    assert st.prev is not None


def test_extrapolate_matches_previous_within_tolerance():
    """Both modes satisfy the same residual criterion; fields agree at the
    solver-tolerance scale."""
    model = load_case(case_static(shape_xyz=(16, 16, 12), steps=4))
    tol = model.solver.tolerance
    ref, rdiag = Simulation(model, dtype=jnp.float64,
                            warm_start="previous").run()
    ext, ediag = Simulation(model, dtype=jnp.float64).run()
    scale = np.abs(np.asarray(ref.A)).max()
    np.testing.assert_allclose(np.asarray(ext.A), np.asarray(ref.A),
                               atol=4 * tol * scale)


def test_extrapolate_reduces_iterations():
    """On a multi-step smooth transient the linear prediction must cut the
    total iteration count (the measured production win)."""
    model = load_case(case_static(shape_xyz=(18, 18, 12), steps=8))
    _, rdiag = Simulation(model, dtype=jnp.float64,
                          warm_start="previous").run()
    _, ediag = Simulation(model, dtype=jnp.float64).run()
    assert sum(ediag["iterations"]) < sum(rdiag["iterations"])


def test_extrapolate_moving_case_converges():
    model = load_case(case_moving(shape_xyz=(16, 16, 10), steps=4))
    _, diag = Simulation(model, dtype=jnp.float64).run()
    assert not diag["unconverged_steps"]


def test_checkpoint_roundtrip_preserves_prev(tmp_path):
    """Exact resume under the extrapolated default: prev is checkpointed,
    so a resumed run reproduces the uninterrupted iterate path."""
    model = load_case(case_static(shape_xyz=(14, 14, 10), steps=6))
    full, fdiag = Simulation(model, dtype=jnp.float64).run()

    ck = str(tmp_path / "ck")
    sim = Simulation(model, dtype=jnp.float64)
    sim.run(num_steps=3, checkpoint_dir=ck, checkpoint_every=3)
    res, rdiag = Simulation(model, dtype=jnp.float64).run(
        checkpoint_dir=ck, resume=True)
    np.testing.assert_array_equal(np.asarray(res.A), np.asarray(full.A))
    np.testing.assert_array_equal(np.asarray(res.prev.A),
                                  np.asarray(full.prev.A))
    assert fdiag["iterations"][3:] == rdiag["iterations"]


def test_scan_path_matches_host_loop():
    """run_scan carries prev through the lax.scan identically."""
    model = load_case(case_static(shape_xyz=(14, 14, 10), steps=5))
    sim = Simulation(model, dtype=jnp.float64, donate=False)
    st_host, hdiag = sim.run()
    st_scan, sdiag = sim.run_scan()
    np.testing.assert_array_equal(np.asarray(st_scan.A), np.asarray(st_host.A))
    assert list(np.asarray(sdiag["iterations"])) == hdiag["iterations"]
