"""Case-coded operator (ops/pallas_coded.py): the encoder must prove
itself against the assembled fields (bit-exact f64 reconstruction), and
the coded kernels (interpret mode on CPU) must reproduce the field
operator's matvec to f32-ulp accuracy on every case family — including
moving-conductor convection (case_convection, both kernel variants),
moving coils, non-default BND multipliers, and the inertia_on_faces
extension."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.assembly.assemble import assemble_operator
from eddy_currents_3d_tpu.assembly.stencil import State
from eddy_currents_3d_tpu.ops import pallas_stencil as ps
from eddy_currents_3d_tpu.ops.pallas_coded import (
    CodedUnsupported, from_assembled_coded,
)
from eddy_currents_3d_tpu.testing.cases import (
    case_convection, case_lim, case_moving, case_static, load_case,
)


def _rand_state(model, sysm, rng, dtype=jnp.float32):
    nz, ny, nx = model.shape_zyx
    A = rng.standard_normal((3, nz, ny, nx))
    U = rng.standard_normal((nz, ny, nx)) * np.asarray(sysm.cond_mask)
    return State(jnp.asarray(A, dtype), jnp.asarray(U, dtype))


def _check_case(model, rng, inertia_on_faces=False, atol_scale=3e-6):
    sysm = assemble_operator(model, jnp.float32,
                             inertia_on_faces=inertia_on_faces)
    # f64 ground truth for the comparison scale
    sys64 = assemble_operator(model, jnp.float64,
                              inertia_on_faces=inertia_on_faces)
    coded = from_assembled_coded(sysm, model,
                                 inertia_on_faces=inertia_on_faces)
    st = _rand_state(model, sysm, rng)
    y_ref = jax.jit(sys64.op.apply)(
        State(st.A.astype(jnp.float64), st.U.astype(jnp.float64)))
    prev = ps.INTERPRET
    ps.INTERPRET = True
    try:
        y_cod = coded.unpad_state(jax.jit(coded.apply)(coded.pad_state(st)))
    finally:
        ps.INTERPRET = prev
    scale = np.abs(np.asarray(y_ref.A)).max()
    np.testing.assert_allclose(np.asarray(y_cod.A, np.float64),
                               np.asarray(y_ref.A), atol=atol_scale * scale)
    uscale = max(np.abs(np.asarray(y_ref.U)).max(), scale)
    np.testing.assert_allclose(np.asarray(y_cod.U, np.float64),
                               np.asarray(y_ref.U), atol=atol_scale * uscale)
    return coded


def test_static_case(rng):
    model = load_case(case_static(shape_xyz=(18, 16, 14), steps=2))
    coded = _check_case(model, rng)
    assert not coded.has_conv


def test_lim_case(rng):
    # lim's coils move, but the conductor itself is static: has_conv must
    # be False (conductor velocity, not coil motion, drives convection)
    model = load_case(case_lim(shape_xyz=(24, 11, 10), steps=2))
    coded = _check_case(model, rng)
    assert not coded.has_conv


def test_moving_case(rng):
    model = load_case(case_moving(shape_xyz=(16, 16, 10), steps=2))
    coded = _check_case(model, rng)
    assert not coded.has_conv


def test_convection_case(rng):
    """Moving conductor (VEX/VEY/VEZ != 0): the has_conv kernel branch is
    live and the coded matvec must match the f64 field operator on EVERY
    component — the assembled convection pair ±Ve_a/(2Δ_a) sits in the
    shared A stencil (assemble.py:184-186), so each component row takes
    convection terms along all three axes, not just its own."""
    model = load_case(case_convection(shape_xyz=(24, 12, 10), steps=2))
    coded = _check_case(model, rng)
    assert coded.has_conv


def test_convection_single_axis(rng):
    # exercise the sparser conv pattern (only one axis live)
    model = load_case(case_convection(shape_xyz=(20, 12, 10), steps=2,
                                      ve=(0.0, 4.0, 0.0)))
    coded = _check_case(model, rng)
    assert coded.has_conv


def test_convection_chunk_depth_one(rng, monkeypatch):
    """Same convection check with the fused kernel forced to CZ=1 (every
    z neighbor crosses a chunk edge — exercises the stitched neighbor-
    plane path rather than in-chunk concatenation)."""
    from eddy_currents_3d_tpu.ops import pallas_coded as pc

    monkeypatch.setattr(pc, "_CHUNK_BUDGET", 0)
    model = load_case(case_convection(shape_xyz=(24, 12, 10), steps=2))
    coded = _check_case(model, rng)
    assert coded.has_conv


def test_ytiled_kernel(rng, monkeypatch):
    """Force the y-tiled fused kernel (the 256³-class path) on a small
    grid by shrinking the whole-plane budget: coded matvec must still
    match the f64 field operator, including cross-tile ±1/±2 y-shift
    stitching through the conductor box."""
    from eddy_currents_3d_tpu.ops import pallas_coded as pc

    monkeypatch.setattr(pc, "_WHOLE_PLANE_BUDGET", 0)
    monkeypatch.setattr(pc, "_YT_BLOCK_BUDGET", 150_000)  # force TY < NYp
    # ny = 18 -> NYp = 24 pads to three 8-row tiles; conductor spans tiles
    model = load_case(case_static(shape_xyz=(18, 18, 12), steps=2))
    _check_case(model, rng)


def test_ytiled_kernel_convection(rng, monkeypatch):
    """Y-tiled path with the convection branch live (full 3x3 neighbor
    map, conv stream block)."""
    from eddy_currents_3d_tpu.ops import pallas_coded as pc

    monkeypatch.setattr(pc, "_WHOLE_PLANE_BUDGET", 0)
    monkeypatch.setattr(pc, "_YT_BLOCK_BUDGET", 150_000)  # force TY < NYp
    model = load_case(case_convection(shape_xyz=(20, 18, 10), steps=2))
    coded = _check_case(model, rng)
    assert coded.has_conv


def test_ytiled_kernel_chunk_depth(rng, monkeypatch):
    """Y-tiled path with CZ > 1 (in-chunk z concatenation + y stitching
    in the same kernel)."""
    from eddy_currents_3d_tpu.ops import pallas_coded as pc

    monkeypatch.setattr(pc, "_WHOLE_PLANE_BUDGET", 0)
    # 250k: TY = 8 tiles AND czb = 2 (y-stitching + in-chunk z planes)
    monkeypatch.setattr(pc, "_YT_BLOCK_BUDGET", 250_000)
    model = load_case(case_static(shape_xyz=(18, 18, 14), steps=2))
    _check_case(model, rng)


def test_scale256_class_accepted():
    """from_assembled_coded must accept the BASELINE-named 256³-class
    plane sizes instead of raising CodedUnsupported (round-4 weak #1).
    Construction only — the full-grid matvec runs on TPU in bench."""
    from eddy_currents_3d_tpu.ops import pallas_coded as pc

    for shape in ((256, 256, 8), (512, 512, 8)):
        model = load_case(case_static(shape_xyz=shape, steps=2))
        sysm = assemble_operator(model, jnp.float32)
        coded = from_assembled_coded(sysm, model)
        NYp, NXp = coded.padded_yx
        assert (19 * NYp * NXp * 4) > pc._WHOLE_PLANE_BUDGET  # y-tiled
        plan = pc._yt_plan(coded)
        assert plan is not None and NYp % plan.TY == 0
        assert plan.cza >= 1 and plan.czb >= 1


def test_custom_bnd_multipliers(rng):
    model = load_case(case_static(shape_xyz=(16, 14, 12), steps=2))
    model.solver.BND = np.array([[-1.0, -0.5], [0.25, -0.95],
                                 [0.0, -0.7]])
    _check_case(model, rng)


def test_inertia_on_faces(rng):
    model = load_case(case_static(shape_xyz=(16, 14, 12), steps=2))
    _check_case(model, rng, inertia_on_faces=True)


def test_apply_div_matches(rng):
    model = load_case(case_static(shape_xyz=(18, 16, 14), steps=2))
    sysm = assemble_operator(model, jnp.float32)
    sys64 = assemble_operator(model, jnp.float64)
    coded = from_assembled_coded(sysm, model)
    st = _rand_state(model, sysm, rng)
    d_ref = jax.jit(sys64.op.apply_div)(st.A.astype(jnp.float64))
    prev = ps.INTERPRET
    ps.INTERPRET = True
    try:
        d_cod = jax.jit(coded.apply_div)(st.A)
    finally:
        ps.INTERPRET = prev
    scale = max(np.abs(np.asarray(d_ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(d_cod, np.float64),
                               np.asarray(d_ref), atol=3e-6 * scale)


def test_f64_unsupported():
    model = load_case(case_static(shape_xyz=(14, 12, 10), steps=2))
    sysm = assemble_operator(model, jnp.float64)
    with pytest.raises(CodedUnsupported):
        from_assembled_coded(sysm, model)


def test_proof_rejects_tampered_fields():
    """The encoder must refuse a system whose coefficients it cannot
    reproduce (defensive fallback path)."""
    model = load_case(case_static(shape_xyz=(14, 12, 10), steps=2))
    sysm = assemble_operator(model, jnp.float32)
    sysm.np_ku[0][sysm.np_ku[0] != 0] *= 1.5
    with pytest.raises(CodedUnsupported):
        from_assembled_coded(sysm, model)


def test_simulation_with_coded_operator_matches():
    """Full transient through Simulation(use_coded=True) vs the field-
    operator run: tolerance-scale field agreement, convergence everywhere.
    (Interpret mode on CPU — on TPU the same selection is automatic.)"""
    from eddy_currents_3d_tpu.sim.simulate import Simulation

    model = load_case(case_static(shape_xyz=(16, 14, 12), steps=3))
    ref, rdiag = Simulation(model, dtype=jnp.float32, use_pallas=False).run()
    assert not rdiag["unconverged_steps"]
    prev = ps.INTERPRET
    ps.INTERPRET = True
    try:
        sim = Simulation(model, dtype=jnp.float32, use_pallas=True,
                         use_coded=True)
        assert sim.coded_op is not None and sim.pallas_op is None
        st, diag = sim.run()
    finally:
        ps.INTERPRET = prev
    assert not diag["unconverged_steps"]
    tol = model.solver.tolerance
    scale = np.abs(np.asarray(ref.A)).max()
    np.testing.assert_allclose(np.asarray(st.A), np.asarray(ref.A),
                               atol=4 * tol * scale)


def test_use_coded_incompatible_raises():
    """An explicit use_coded=True must raise (not silently fall back to the
    field kernels) when another option disables the coded path."""
    from eddy_currents_3d_tpu.sim.simulate import Simulation

    model = load_case(case_static(shape_xyz=(16, 14, 12), steps=2))
    with pytest.raises(ValueError, match="use_coded=True is incompatible"):
        Simulation(model, dtype=jnp.float32, use_pallas=False, use_coded=True)
    with pytest.raises(ValueError, match="use_coded=True is incompatible"):
        Simulation(model, dtype=jnp.float64, use_coded=True)


def test_conductor_touching_z_face(rng):
    """Conductor slab starting at the z=0 grid face: exercises the gating
    lower bound zb0=0, the face-cell (non-intc) code bits, and clamped
    z-neighbor blocks at the grid edge."""
    from eddy_currents_3d_tpu.testing.cases import make_vxc_text

    nx, ny, nz = 20, 14, 12
    geo = np.zeros((nz, ny, nx), np.int64)
    geo[0:5, 3:ny - 3, 3:nx - 3] = 1          # slab ON the z- face
    geo[8, 4, 5:nx - 5] = 2                   # one x-directed coil run
    names = [
        "plast D=1 C='mu0*35e6'",
        "coil D=1 SRCx=F",
        "param tran stop=0.002 step=1e-3",
        "p2 solver tol=5e-3 itmax=10000 dir=out",
        "f1 func F=a*cos(p2*f*t) a='100/(dx*dz)' p2='2*pi' f=50 t=t",
    ]
    model = load_case(make_vxc_text((nx, ny, nz), 0.004, names, geo.ravel()))
    coded = _check_case(model, rng)
    assert coded.cond_z[0] == 0


def _check_apply_dots(model, rng, monkeypatch=None, force_ytiled=False):
    from eddy_currents_3d_tpu.ops import pallas_coded as pc

    if force_ytiled:
        monkeypatch.setattr(pc, "_WHOLE_PLANE_BUDGET", 0)
        monkeypatch.setattr(pc, "_YT_BLOCK_BUDGET", 150_000)
    sysm = assemble_operator(model, jnp.float32)
    coded = from_assembled_coded(sysm, model)
    x = coded.pad_state(_rand_state(model, sysm, rng))
    w = coded.pad_state(_rand_state(model, sysm,
                                    np.random.default_rng(7)))
    prev = ps.INTERPRET
    ps.INTERPRET = True
    try:
        y, y_w, y_y = jax.jit(coded.apply_dots)(x, w)
        y_ref = jax.jit(coded.apply)(x)
    finally:
        ps.INTERPRET = prev
    # y agrees with apply() to FMA-reassociation tolerance, not bitwise:
    # the extra dot consumers change the compiler's fusion groupings of
    # the same stencil expression (measured max rel diff ~5e-5 on the
    # per-plane y-tiled kernel; zeros stay exact on both paths)
    np.testing.assert_allclose(np.asarray(y.A), np.asarray(y_ref.A),
                               rtol=2e-4, atol=0.0)
    np.testing.assert_allclose(np.asarray(y.U), np.asarray(y_ref.U),
                               rtol=2e-4, atol=0.0)
    ref_w = float(np.vdot(np.asarray(y.A, np.float64), np.asarray(w.A, np.float64))
                  + np.vdot(np.asarray(y.U, np.float64), np.asarray(w.U, np.float64)))
    ref_y = float(np.vdot(np.asarray(y.A, np.float64), np.asarray(y.A, np.float64))
                  + np.vdot(np.asarray(y.U, np.float64), np.asarray(y.U, np.float64)))
    assert abs(float(y_w) - ref_w) < 2e-5 * max(abs(ref_w), 1.0)
    assert abs(float(y_y) - ref_y) < 2e-5 * max(abs(ref_y), 1.0)


def test_apply_dots_whole_plane(rng):
    """Fused matvec+reduction outputs: y identical to apply(); the two
    dots match f64 reference reductions to f32 accumulation accuracy."""
    model = load_case(case_static(shape_xyz=(18, 16, 14), steps=2))
    _check_apply_dots(model, rng)


def test_apply_dots_ytiled(rng, monkeypatch):
    model = load_case(case_static(shape_xyz=(18, 18, 12), steps=2))
    _check_apply_dots(model, rng, monkeypatch, force_ytiled=True)
