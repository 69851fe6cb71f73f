"""Simulation-level coverage of the z-compact U solver space.

The y-tiled coded path (ops/pallas_coded.py, the 256³-class layout) keeps
the U unknowns of the padded solver space on the conductor's slab chunks
only; everything outside the operator's pad_state/unpad_state boundary —
RHS construction, warm start, post-solve carry, VTK output — stays
full-grid.  These tests force the y-tiled path on a small grid (interpret
mode, CPU) and check that a full transient through Simulation matches the
flat-roll reference operator, i.e. that the compact layout is truly
transparent at the package surface.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
from eddy_currents_3d_tpu.assembly.stencil import State
from eddy_currents_3d_tpu.ops import pallas_coded as pc
from eddy_currents_3d_tpu.ops import pallas_stencil as ps
from eddy_currents_3d_tpu.sim.simulate import Simulation
from eddy_currents_3d_tpu.testing.cases import case_static, load_case


@pytest.fixture
def ytiled_interpret(monkeypatch):
    monkeypatch.setattr(pc, "_WHOLE_PLANE_BUDGET", 0)
    monkeypatch.setattr(pc, "_YT_BLOCK_BUDGET", 150_000)  # TY < NYp
    monkeypatch.setattr(ps, "INTERPRET", True)
    yield


def test_compact_pad_unpad_roundtrip(ytiled_interpret):
    model = load_case(case_static(shape_xyz=(18, 18, 12), steps=2))
    sysm = assemble_operator(model, jnp.float32)
    coded = pc.from_assembled_coded(sysm, model)
    plan = pc._yt_plan(coded)
    assert plan is not None and coded.compact_u
    nz, ny, nx = coded.shape_zyx
    assert plan.nzc < nz                     # compaction actually engages
    rng = np.random.default_rng(0)
    # U nonzero only on conducting cells — the solver-space invariant
    U = (rng.standard_normal((nz, ny, nx))
         * np.asarray(sysm.cond_mask)).astype(np.float32)
    st = State(jnp.asarray(rng.standard_normal((3, nz, ny, nx)),
                           jnp.float32), jnp.asarray(U))
    p = coded.pad_state(st)
    assert p.U.shape[0] == plan.nzc          # compact U planes
    back = coded.unpad_state(p)
    np.testing.assert_array_equal(np.asarray(back.A), np.asarray(st.A))
    np.testing.assert_array_equal(np.asarray(back.U), np.asarray(st.U))


@pytest.mark.parametrize("precond", [None, "jacobi"])
def test_simulation_matches_reference_op(ytiled_interpret, precond):
    """3-step transient through the compact-U coded path == the flat-roll
    jnp operator path (same dtype, same stopping rule) within solver
    tolerance of each other."""
    model = load_case(case_static(shape_xyz=(18, 18, 12), steps=3))
    kw = {} if precond is None else {"precond": precond}
    sim_c = Simulation(model, dtype=jnp.float32, use_pallas=True,
                       use_coded=True, **kw)
    assert sim_c.coded_op is not None and sim_c.coded_op.compact_u
    assert pc._yt_plan(sim_c.coded_op) is not None
    st_c, d_c = sim_c.run()
    sim_r = Simulation(model, dtype=jnp.float32, use_pallas=False)
    st_r, d_r = sim_r.run()
    assert all(i > 0 for i in np.asarray(d_c["iterations"]))
    scale = max(float(np.abs(np.asarray(st_r.A)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(st_c.A), np.asarray(st_r.A),
                               atol=2 * model.solver.tolerance * scale)
    uscale = max(float(np.abs(np.asarray(st_r.U)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(st_c.U), np.asarray(st_r.U),
                               atol=2 * model.solver.tolerance * uscale)
    # U identically zero outside the conductor (the invariant the
    # compact layout relies on)
    outside = ~np.asarray(sim_c.system.cond_mask)
    assert np.all(np.asarray(st_c.U)[outside] == 0.0)
