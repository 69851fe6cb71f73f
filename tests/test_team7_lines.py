"""TEAM7 validation line profiles (the reference's acceptance artifact,
README.md:113-129) — golden pin + independent-oracle cross-check.

docs/validation/team7_lines.npz holds the framework's f64 eddy-current
density along the published Line X / Line Y at t = 0.017 s (see
docs/validation/gen_team7_lines.py for the position derivation).  This test
recomputes the same profiles from the *independent* oracle trajectory
(tests/goldens/team7_oracle.npz, step-17 state) and checks agreement, so the
published artifact is anchored to the per-cell Fortran-style transcription,
not to the framework itself."""

import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
VAL = os.path.join(os.path.dirname(HERE), "docs", "validation")
sys.path.insert(0, VAL)

LINES = os.path.join(VAL, "team7_lines.npz")
ORACLE = os.path.join(HERE, "goldens", "team7_oracle.npz")


@pytest.fixture(scope="module")
def artifacts(ref_path):
    if not (os.path.exists(LINES) and os.path.exists(ORACLE)):
        pytest.skip("validation goldens not generated")
    from eddy_currents_3d_tpu.models.vxc import read_vxc
    model = read_vxc(os.path.join(ref_path, "compare_to_Elmer.vxc"))
    return np.load(LINES), np.load(ORACLE), model


def test_line_profiles_match_independent_oracle(artifacts):
    lines, oracle, model = artifacts
    from gen_team7_lines import lines_from_carry

    N = model.n_cells
    shape = (3,) + model.shape_zyx
    carry_o = oracle["J_17"][: 3 * N].reshape(shape)
    dist, lX_o, lY_o = lines_from_carry(
        carry_o, np.asarray(model.cond_mask), float(model.delta[0]))

    np.testing.assert_allclose(lines["dist"], dist, rtol=1e-12)
    # 17 steps of warm-started BiCGSTAB: framework and oracle trajectories
    # have drifted ~6e-2 relative on the carry (see test_oracle_golden.py);
    # the line profiles inherit that bound
    for name, got, ref in (("lineX", lines["lineX"], lX_o),
                           ("lineY", lines["lineY"], lY_o)):
        scale = np.abs(ref).max()
        assert scale > 1e4, name           # physically sized (published ~1e5)
        np.testing.assert_allclose(got, ref, atol=0.15 * scale,
                                   err_msg=name)


def test_line_profiles_published_features(artifacts):
    """The qualitative features of the reference's Fig. 5 (and published
    amplitudes to ~25%): magnitudes, feature positions, signs."""
    lines, _, _ = artifacts
    d, lX, lY = lines["dist"], lines["lineX"], lines["lineY"]
    JmX = np.sqrt((lX ** 2).sum(0))
    JmY = np.sqrt((lY ** 2).sum(0))
    # Line Y: ~1.6e5 spike at y->0 carried by -Jx; secondary peak near 0.19
    assert 1.2e5 < JmY[0] < 1.9e5 and lY[0, 0] < -1.2e5
    i = int(np.argmax(JmY[30:]) + 30)
    assert 0.17 < d[i] < 0.21 and 7e4 < JmY[i] < 1.2e5
    # Line X: initial spike, Jy deep negative dip near 0.19, second Jm peak
    assert 1.0e5 < JmX[0] < 1.6e5
    j = int(np.argmin(lX[1]))
    assert 0.17 < d[j] < 0.21 and -1.1e5 < lX[1, j] < -6e4
    k = int(np.argmax(JmX[30:]) + 30)
    assert 0.17 < d[k] < 0.21 and 7e4 < JmX[k] < 1.2e5
