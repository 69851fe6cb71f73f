"""Checkpoint / resume: a split run must reproduce an uninterrupted run."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.sim import checkpoint as ckpt
from eddy_currents_3d_tpu.sim.simulate import Simulation
from eddy_currents_3d_tpu.testing.cases import case_moving, case_static, load_case


def test_split_run_matches_uninterrupted(tmp_path):
    model = load_case(case_static(shape_xyz=(14, 13, 11), steps=4))
    full_state, full_diag = Simulation(model, dtype=jnp.float64,
                                       dot_dtype=jnp.float64).run()

    cdir = str(tmp_path / "ck")
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64)
    sim.run(num_steps=2, checkpoint_dir=cdir, checkpoint_every=1)
    assert os.path.exists(os.path.join(cdir, "ckpt_2.npz"))

    sim2 = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64)
    state, diag = sim2.run(checkpoint_dir=cdir, resume=True)
    assert diag["start_step"] == 2
    np.testing.assert_array_equal(np.asarray(state.A), np.asarray(full_state.A))
    np.testing.assert_array_equal(np.asarray(state.carry), np.asarray(full_state.carry))


def test_moving_case_motion_state_restored(tmp_path):
    model = load_case(case_moving(shape_xyz=(16, 16, 10), steps=4))
    full_state, _ = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64).run()

    cdir = str(tmp_path / "ck")
    Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64).run(
        num_steps=2, checkpoint_dir=cdir, checkpoint_every=2)
    state, diag = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64).run(
        checkpoint_dir=cdir, resume=True)
    np.testing.assert_array_equal(np.asarray(state.motion.distance),
                                  np.asarray(full_state.motion.distance))
    np.testing.assert_array_equal(np.asarray(state.A), np.asarray(full_state.A))


def test_fingerprint_mismatch_rejected(tmp_path):
    m1 = load_case(case_static(shape_xyz=(14, 13, 11), steps=3))
    m2 = load_case(case_static(shape_xyz=(14, 13, 11), steps=3, tol=1e-4))
    cdir = str(tmp_path / "ck")
    Simulation(m1, dtype=jnp.float64).run(num_steps=1, checkpoint_dir=cdir,
                                          checkpoint_every=1)
    path = ckpt.latest_checkpoint(cdir)
    with pytest.raises(ValueError, match="different model"):
        ckpt.load_checkpoint(path, ckpt.model_fingerprint(m2))


def test_latest_checkpoint_selection(tmp_path):
    assert ckpt.latest_checkpoint(str(tmp_path)) is None
    model = load_case(case_static(shape_xyz=(14, 13, 11), steps=3))
    sim = Simulation(model, dtype=jnp.float64)
    sim.run(checkpoint_dir=str(tmp_path), checkpoint_every=1)
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("ckpt_3.npz")
