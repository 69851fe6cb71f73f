"""Pallas fused stencil kernels vs the jnp reference apply (interpreter mode
on CPU; on real TPU hardware the same kernels run compiled)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
from eddy_currents_3d_tpu.assembly.stencil import State
from eddy_currents_3d_tpu.ops import pallas_stencil
from eddy_currents_3d_tpu.sim.simulate import Simulation
from eddy_currents_3d_tpu.testing.cases import case_lim, case_static, load_case, make_vxc_text


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_stencil, "INTERPRET", True)


def _rand_state(model, sysm, rng):
    nz, ny, nx = model.shape_zyx
    A = rng.standard_normal((3, nz, ny, nx))
    U = rng.standard_normal((nz, ny, nx)) * np.asarray(sysm.cond_mask)
    return State(jnp.asarray(A), jnp.asarray(U))


@pytest.mark.parametrize("case", ["static", "lim", "nocond"])
def test_pallas_apply_matches_jnp(case, rng):
    if case == "static":
        model = load_case(case_static(shape_xyz=(14, 13, 11), steps=2))
    elif case == "lim":
        model = load_case(case_lim(shape_xyz=(24, 11, 10), steps=2))
    else:
        geo = np.zeros((6, 8, 9), np.int64)
        geo[4, 4, 4] = 1
        names = ["coil D=1 SRCx=F1", "param tran stop=2m step=1m",
                 "p solver tol=5m itmax=9 dir=o", "f1 func F1=a a=1 t=t"]
        model = load_case(make_vxc_text((9, 8, 6), 0.01, names, geo.ravel()))

    sysm = assemble_operator(model, jnp.float64)
    pop = pallas_stencil.from_assembled(sysm)
    st = _rand_state(model, sysm, rng)

    y_ref = sysm.op.apply(st)
    y_pal = pop.unpad_state(pop.apply(pop.pad_state(st)))
    np.testing.assert_allclose(np.asarray(y_pal.A), np.asarray(y_ref.A),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(y_pal.U), np.asarray(y_ref.U),
                               rtol=1e-12, atol=1e-12)


def test_pad_roundtrip_and_zero_invariant(rng):
    model = load_case(case_static(shape_xyz=(14, 13, 11), steps=2))
    sysm = assemble_operator(model, jnp.float64)
    pop = pallas_stencil.from_assembled(sysm)
    nz, ny, nx = model.shape_zyx
    st = _rand_state(model, sysm, rng)
    stp = pop.pad_state(st)
    # padded entries zero and round trip exact
    assert float(jnp.abs(stp.A[:, :, ny:, :]).max()) == 0.0
    assert float(jnp.abs(stp.A[:, :, :, nx:]).max()) == 0.0
    back = pop.unpad_state(stp)
    np.testing.assert_array_equal(np.asarray(back.A), np.asarray(st.A))
    # applying the operator keeps padding exactly zero (solver invariant)
    y = pop.apply(stp)
    assert float(jnp.abs(y.A[:, :, ny:, :]).max()) == 0.0
    assert float(jnp.abs(y.A[:, :, :, nx:]).max()) == 0.0
    assert float(jnp.abs(y.U[:, ny:, :]).max()) == 0.0


def test_simulation_with_pallas_matches_plain():
    model = load_case(case_static(shape_xyz=(14, 13, 11), steps=2))
    ref_state, _ = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64,
                              use_pallas=False).run()
    pal_state, _ = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64,
                              use_pallas=True).run()
    scale = np.abs(np.asarray(ref_state.A)).max()
    np.testing.assert_allclose(np.asarray(pal_state.A), np.asarray(ref_state.A),
                               atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(pal_state.carry), np.asarray(ref_state.carry),
                               atol=1e-9 * max(np.abs(np.asarray(ref_state.carry)).max(), 1e-30))


def test_pallas_apply_multi_ytile(rng, monkeypatch):
    """Force several y-tiles so the cross-tile y-shift stitching runs."""
    monkeypatch.setattr(pallas_stencil, "_tile_y", lambda *a, **k: 8)
    model = load_case(case_static(shape_xyz=(14, 29, 11), steps=2))  # NYp=32 -> 4 tiles
    sysm = assemble_operator(model, jnp.float64)
    pop = pallas_stencil.from_assembled(sysm)
    st = _rand_state(model, sysm, rng)
    y_ref = sysm.op.apply(st)
    y_pal = pop.unpad_state(pop.apply(pop.pad_state(st)))
    np.testing.assert_allclose(np.asarray(y_pal.A), np.asarray(y_ref.A),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(y_pal.U), np.asarray(y_ref.U),
                               rtol=1e-12, atol=1e-12)
