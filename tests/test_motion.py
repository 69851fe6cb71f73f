"""Moving-source semantics vs a literal per-voxel transcription of
motion_calc/new_m (EC3D.f90:1052-1114)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.sim.motion import FunctionMotion, advance_function


def _oracle_new_m(ijk0, length, movestop, shape_xyz):
    """Sequential per-voxel transcription (0-based)."""
    ms = movestop.copy()
    out = np.empty(len(ijk0), np.int64)
    sdx, sdy, sdz = shape_xyz
    for vi, (i, j, k) in enumerate(ijk0):
        new = [i + length[0], j + length[1], k + length[2]]
        for a, sd in enumerate(shape_xyz):
            if new[a] > sd - 3:
                ms[a] = 0; new[a] = sd - 3
            elif new[a] < 1:
                ms[a] = 0; new[a] = 1
            elif ms[a] == 0 and (new[a] < sd - 3 or new[a] > 1):
                ms[a] = 1
        out[vi] = new[0] + sdx * new[1] + sdx * sdy * new[2]
    return out, ms


def _fm(ijk0, shape, const_shift=(0.0, 0.0, 0.0), vmech=(0, 0, 0)):
    return FunctionMotion(
        index=0,
        ijk0=np.asarray(ijk0, np.int32),
        const_shift=np.asarray(const_shift, float),
        vmech_index=vmech,
        shape_xyz=shape,
    )


@pytest.mark.parametrize("shift,steps", [(0.6, 5), (-1.4, 8), (3.2, 6)])
def test_constant_velocity_trajectory(shift, steps):
    shape = (14, 12, 10)
    ijk0 = np.array([[x, y, 4] for x in range(5, 8) for y in range(4, 6)])
    fm = _fm(ijk0, shape, const_shift=(shift, 0.0, 0.0))
    dist = jnp.zeros(3)
    comp = jnp.zeros(3)
    ms = jnp.ones(3, jnp.int32)
    dist_o = np.zeros(3)
    ms_o = np.ones(3, int)
    for _ in range(steps):
        dist, comp, ms, flat = advance_function(fm, dist, comp, ms, jnp.zeros(1), 1.0, np.ones(3))
        # oracle: motion_calc uses movestop[0] for constant-velocity axes
        dist_o[0] += ms_o[0] * shift
        length = np.trunc(dist_o + np.where(dist_o >= 0, 0.5, -0.5)).astype(int)
        flat_o, ms_o = _oracle_new_m(ijk0, length, ms_o, shape)
        np.testing.assert_array_equal(np.asarray(flat), flat_o)
        np.testing.assert_array_equal(np.asarray(ms), ms_o)
        np.testing.assert_allclose(np.asarray(dist), dist_o, rtol=1e-12)


def test_clamp_latches_and_rearms():
    """Drive voxels into the +x wall, hold, then reverse: the latch must drop
    to 0 at the wall (freezing constant-velocity accumulation) and re-arm
    when back in range."""
    shape = (12, 10, 10)
    # single voxel: with several voxels the LAST one decides the latch (the
    # reference's sequential per-voxel updates; covered by the trajectory test)
    ijk0 = np.array([[8, 4, 4]])
    fm = _fm(ijk0, shape, const_shift=(1.0, 0.0, 0.0))
    dist = jnp.zeros(3); comp = jnp.zeros(3); ms = jnp.ones(3, jnp.int32)
    hits = []
    for _ in range(4):
        dist, comp, ms, flat = advance_function(fm, dist, comp, ms, jnp.zeros(1), 1.0, np.ones(3))
        hits.append((int(ms[0]), np.asarray(flat)[0] % 12))
    # step1: 8+1=9 = sd-3 in range -> latch stays 1; step2: 10 > 9 clamp -> 0;
    # after latch drops, distance freezes (ms[0]=0 multiplies the shift)
    assert [h[0] for h in hits[:2]] == [1, 0]
    assert hits[1][1] == 9            # clamped at sd-3
    assert hits[2] == hits[1]         # frozen
    d_frozen = float(dist[0])
    # reverse direction via new motion spec: latch-0 keeps constant-velocity
    # axes frozen forever in the reference (Distance += 0*shift) — verify
    fm_rev = _fm(ijk0, shape, const_shift=(-1.0, 0.0, 0.0))
    dist, comp, ms, flat = advance_function(fm_rev, dist, comp, ms, jnp.zeros(1), 1.0, np.ones(3))
    assert float(dist[0]) == d_frozen


def test_function_velocity_ignores_latch():
    """Function-driven axes accumulate regardless of movestop
    (EC3D.f90:1057-1059)."""
    shape = (12, 10, 10)
    ijk0 = np.array([[5, 4, 4]])
    fm = _fm(ijk0, shape, vmech=(1, 0, 0))
    dist = jnp.zeros(3); comp = jnp.zeros(3)
    ms = jnp.zeros(3, jnp.int32)   # latch down
    dist, comp, ms, flat = advance_function(fm, dist, comp, ms, jnp.asarray([2.5]), 1.0, np.ones(3))
    assert float(dist[0]) == pytest.approx(2.5)


def test_moving_simulation_matches_oracle_loop():
    """Full moving-coil simulation vs the oracle numpy loop (few steps,
    loose tolerance — same algorithm, different arithmetic order)."""
    from eddy_currents_3d_tpu.sim.simulate import Simulation
    from eddy_currents_3d_tpu.testing.cases import case_moving, load_case
    from oracle import OracleSimulator

    model = load_case(case_moving(shape_xyz=(16, 16, 10), steps=3))
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64,
                     warm_start="previous")
    st, diag = sim.run()
    Uaf, Jaf, iters = OracleSimulator(model).run(3)

    N = model.n_cells
    A_o = Uaf[: 3 * N].reshape(np.asarray(st.A).shape)
    scale = np.abs(A_o).max()
    assert scale > 0
    np.testing.assert_allclose(np.asarray(st.A), A_o, atol=2e-3 * scale)
    J_o = Jaf[: 3 * N].reshape(np.asarray(st.carry).shape)
    np.testing.assert_allclose(
        np.asarray(st.carry), J_o, atol=2e-3 * max(np.abs(J_o).max(), 1e-30)
    )


def test_long_transient_f32_matches_f64_oracle():
    """2,500-step moving-source trajectory with an f32 Kahan-compensated
    accumulator vs the reference's f64 sequential accumulation
    (EC3D.f90:1052-1062): every nint() voxel shift must agree.  A plain
    f32 running sum drifts by ~n*ulp and mis-rounds shifts on transients
    this long; the compensation keeps the error at ~1 ulp per term."""
    shape = (64, 12, 10)
    ijk0 = np.array([[20, 5, 4]])
    # adversarial increment: irrational-ish fraction of a cell, long period
    shift = 0.0503711938
    fm = _fm(ijk0, shape, vmech=(1, 0, 0))
    dist = jnp.zeros(3, jnp.float32)
    comp = jnp.zeros(3, jnp.float32)
    ms = jnp.ones(3, jnp.int32)
    dist64 = np.zeros(3)
    n_steps = 2500
    naive32 = np.float32(0.0)
    for s in range(n_steps):
        # reciprocating velocity so the voxel stays in range
        v = shift if (s // 500) % 2 == 0 else -shift
        vv = jnp.asarray([v], jnp.float32)
        dist, comp, ms, flat = advance_function(fm, dist, comp, ms, vv, 1.0, np.ones(3))
        dist64[0] += np.float64(np.float32(v))
        naive32 = np.float32(naive32 + np.float32(v))
        length64 = np.trunc(dist64 + np.where(dist64 >= 0, 0.5, -0.5)).astype(int)
        flat_o, _ = _oracle_new_m(ijk0, length64, np.ones(3, int), shape)
        np.testing.assert_array_equal(np.asarray(flat), flat_o,
                                      err_msg=f"voxel shift diverged at step {s}")
    # the compensated f32 accumulator tracks f64 to ~1 ulp...
    assert abs(float(dist[0]) - dist64[0]) < 1e-5
    # ...while this transient is long enough that the naive f32 sum has
    # visibly drifted from it (guards that the test has teeth)
    assert abs(float(naive32) - dist64[0]) > abs(float(dist[0]) - dist64[0])


def test_latch_freezes_distance_bit_exactly_with_compensation():
    """While the clamp latch is down, the reference's Distance += 0*shift
    freezes the accumulator bit-exactly.  The Kahan update must be skipped
    (not fed a zero term), or the pending compensation would leak into the
    frozen distance and could flip the nint() voxel shift."""
    shape = (12, 10, 10)
    ijk0 = np.array([[5, 4, 4]])
    # fractional shift accumulates a nonzero f32 compensation; large
    # enough to hit the +x wall within a few steps (the clamp then holds
    # the latch down every subsequent step, EC3D.f90:1068-1111)
    fm = _fm(ijk0, shape, const_shift=(0.7, 0.0, 0.0))
    dist = jnp.zeros(3, jnp.float32)
    comp = jnp.zeros(3, jnp.float32)
    ms = jnp.ones(3, jnp.int32)
    for _ in range(40):
        dist, comp, ms, _ = advance_function(fm, dist, comp, ms,
                                             jnp.zeros(1), 1.0, np.ones(3))
        if int(ms[0]) == 0:
            break
    assert int(ms[0]) == 0                # latched at the wall
    assert float(comp[0]) != 0.0          # the test needs a live residual
    frozen = float(dist[0])
    frozen_comp = float(comp[0])
    for _ in range(5):
        dist, comp, ms, _ = advance_function(fm, dist, comp, ms,
                                             jnp.zeros(1), 1.0, np.ones(3))
        assert int(ms[0]) == 0            # still clamped at the wall
        assert float(dist[0]) == frozen   # frozen to the bit
        assert float(comp[0]) == frozen_comp
