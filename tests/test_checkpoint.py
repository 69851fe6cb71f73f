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


def test_scan_checkpoint_resume_bit_identical(tmp_path):
    """--scan with checkpointing: an interrupted chunked-scan run resumed
    from its checkpoint must reproduce the uninterrupted scan run
    bit-for-bit (round-3 VERDICT item #6)."""
    import jax.numpy as jnp
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_moving, load_case

    text = case_moving(shape_xyz=(14, 14, 10), steps=8)
    model = load_case(text)
    ckdir = str(tmp_path / "ck")

    # uninterrupted scan run (no checkpointing)
    ref_sim = Simulation(model, dtype=jnp.float32)
    ref_state, ref_diag = ref_sim.run_scan()

    # interrupted: checkpoint every 3 steps, stop after 5 steps
    sim1 = Simulation(model, dtype=jnp.float32)
    sim1.run_scan(num_steps=5, checkpoint_dir=ckdir, checkpoint_every=3)
    # resume to the end in a fresh Simulation
    sim2 = Simulation(model, dtype=jnp.float32)
    state, diag = sim2.run_scan(checkpoint_dir=ckdir, checkpoint_every=3,
                                resume=True)
    assert int(diag["start_step"]) == 5

    np.testing.assert_array_equal(np.asarray(state.A), np.asarray(ref_state.A))
    np.testing.assert_array_equal(np.asarray(state.U), np.asarray(ref_state.U))
    np.testing.assert_array_equal(np.asarray(state.carry),
                                  np.asarray(ref_state.carry))
    np.testing.assert_array_equal(np.asarray(state.motion.distance),
                                  np.asarray(ref_state.motion.distance))
    # resumed iteration counts equal the uninterrupted run's tail
    np.testing.assert_array_equal(np.asarray(diag["iterations"]),
                                  np.asarray(ref_diag["iterations"])[5:])


def test_scan_checkpoint_with_output_matches_run(tmp_path):
    """Chunked scan with BOTH VTK output and checkpointing produces the
    same files as the host-loop run."""
    import jax.numpy as jnp
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    model = load_case(case_static(shape_xyz=(14, 14, 10), steps=6,
                                  jump=2e-3))
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1, d1 = Simulation(model, dtype=jnp.float32).run(output_dir=out1)
    s2, d2 = Simulation(model, dtype=jnp.float32).run_scan(
        output_dir=out2, checkpoint_dir=str(tmp_path / "ck2"),
        checkpoint_every=4)
    names = sorted(os.listdir(out1))
    assert names == sorted(os.listdir(out2)) and names
    for n in names:
        with open(os.path.join(out1, n), "rb") as f1, \
             open(os.path.join(out2, n), "rb") as f2:
            assert f1.read() == f2.read(), n
    assert os.path.exists(os.path.join(str(tmp_path / "ck2"), "ckpt_4.npz"))


def test_resume_without_checkpoint_keeps_initial_state(tmp_path):
    """resume=True on an empty checkpoint dir must run from the explicit
    initial_state, not silently restart from zeros (the natural 'start
    from this state, resume if interrupted' idiom)."""
    import jax.numpy as jnp
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    model = load_case(case_static(shape_xyz=(14, 12, 10), steps=3))
    sim = Simulation(model, dtype=jnp.float32, donate=False)
    warm = sim.init_state()._replace(A=sim.init_state().A + 0.5)
    ckdir = str(tmp_path / "empty")
    st, diag = sim.run(num_steps=1, initial_state=warm,
                       checkpoint_dir=ckdir, checkpoint_every=5, resume=True)
    ref, _ = Simulation(model, dtype=jnp.float32, donate=False).run(
        num_steps=1, initial_state=warm)
    np.testing.assert_array_equal(np.asarray(st.A), np.asarray(ref.A))


def test_scan_checkpoint_resume_past_horizon(tmp_path):
    """Resuming with a horizon at/below the stored step runs zero steps
    and must neither crash nor write a checkpoint whose step index
    contradicts the state it contains."""
    import jax.numpy as jnp
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_static, load_case

    model = load_case(case_static(shape_xyz=(14, 12, 10), steps=8))
    ckdir = str(tmp_path / "ck")
    Simulation(model, dtype=jnp.float32).run_scan(
        num_steps=6, checkpoint_dir=ckdir, checkpoint_every=3)
    before = sorted(os.listdir(ckdir))
    sim = Simulation(model, dtype=jnp.float32)
    state, diag = sim.run_scan(num_steps=4, checkpoint_dir=ckdir,
                               checkpoint_every=3, resume=True)
    assert int(diag["start_step"]) == 6
    assert len(np.asarray(diag["iterations"])) == 0
    assert sorted(os.listdir(ckdir)) == before   # no lying ckpt_4.npz


def test_resume_without_dir_raises():
    """Library callers must get an error, not a silent cold start, when
    resume=True has no checkpoint_dir (round-4 advisor finding)."""
    model = load_case(case_static(shape_xyz=(12, 12, 10), steps=2))
    sim = Simulation(model, dtype=jnp.float64)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        sim.run(resume=True)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        sim.run_scan(resume=True)


def test_no_duplicate_final_checkpoint_write(tmp_path, monkeypatch):
    """When len(steps) is a multiple of checkpoint_every the loop already
    wrote ckpt_<len>.npz; the final save must not rewrite it (round-4
    advisor finding) — counted via a save_checkpoint spy."""
    model = load_case(case_static(shape_xyz=(12, 12, 10), steps=4))
    calls = []
    real = ckpt.save_checkpoint

    def spy(path, *a, **kw):
        calls.append(os.path.basename(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(ckpt, "save_checkpoint", spy)
    cdir = str(tmp_path / "ck")
    Simulation(model, dtype=jnp.float64).run(
        checkpoint_dir=cdir, checkpoint_every=2)
    assert calls.count("ckpt_4.npz") == 1
    calls.clear()
    cdir2 = str(tmp_path / "ck2")
    Simulation(model, dtype=jnp.float64).run_scan(
        checkpoint_dir=cdir2, checkpoint_every=2)
    assert calls.count("ckpt_4.npz") == 1


def test_empty_horizon_relres_dtype_matches_live_run(tmp_path):
    """A zero-step resume must return diagnostics with the same dtypes as
    a live run (round-4 advisor finding: hardcoded float32 relres)."""
    model = load_case(case_static(shape_xyz=(12, 12, 10), steps=3))
    cdir = str(tmp_path / "ck")
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64)
    _, live = sim.run_scan(checkpoint_dir=cdir, checkpoint_every=1)
    sim2 = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64)
    _, empty = sim2.run_scan(checkpoint_dir=cdir, resume=True)
    assert len(np.asarray(empty["iterations"])) == 0
    assert np.asarray(empty["relres"]).dtype == np.asarray(live["relres"]).dtype
