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


ELMER = os.path.join(VAL, "elmer_digitized.npz")


@pytest.fixture(scope="module")
def elmer():
    if not (os.path.exists(ELMER) and os.path.exists(LINES)):
        pytest.skip("digitized Elmer curves not generated")
    return np.load(ELMER), np.load(LINES)


def test_line_profiles_match_digitized_elmer(elmer):
    """Quantitative version of the reference's visual acceptance criterion
    (README.md:113-129): the framework's Line X / Line Y eddy-current
    profiles at t = 0.017 s must match the ElmerFEM curves digitized from
    the published figures (docs/validation/digitize_elmer.py).

    Tolerances state the real uncertainty honestly: the published figures
    draw Elmer (solid) and EC3D (dashed) in the same colors, so the
    median-digitized curve is the two codes' agreement corridor (a few px
    wide ~ 3-5 kA/m^2), the x->0 spike is near-vertical (per-column median
    is the segment midpoint there, so the first 20 mm use the min/max
    envelope instead), and this framework reproduces the *reference's*
    discretization, which itself deviates from Elmer locally by up to
    ~25% (visible in the published overlay around x ~ 0.1 on Line X)."""
    dig, lines = elmer
    dist = lines["dist"]
    for nm, rms_tol in (("lineX", 0.18), ("lineY", 0.10)):
        our = np.sqrt((lines[nm] ** 2).sum(0))
        elm = np.interp(dist, dig[f"{nm}_dist"], dig[f"{nm}_Jm"])
        scale = elm.max()
        m = dist >= 0.02                       # away from the vertical spike
        rms = np.sqrt(((our - elm)[m] ** 2).mean()) / scale
        assert rms < rms_tol, (nm, rms)        # measured 0.133 / 0.046
        # peak magnitude: bracketed between the resolvable-scale median
        # peak and the drawn-corridor upper envelope
        ratio = our.max() / scale
        assert 0.85 < ratio < 1.20, (nm, ratio)      # measured 1.12 / 1.02
        assert our.max() <= 1.02 * float(dig[f"{nm}_Jm_peak"]), nm


def test_line_x_jy_dip_matches_elmer(elmer):
    """Line X's dominant feature: the deep negative J_y lobe under the
    return conductor — depth within the drawn corridor, position within
    two cells of the digitized minimum, sign structure preserved."""
    dig, lines = elmer
    dist = lines["dist"]
    our_jy = lines["lineX"][1]
    dig_x = dig["lineX_dist"]
    dig_jy = dig["lineX_Jy"]
    # depth vs the digitized lower envelope (measured ratio 0.966)
    trough = float(dig["lineX_Jy_trough"])
    assert 0.75 < our_jy.min() / trough < 1.05
    # position of the minimum (measured 0.191 vs 0.186)
    assert abs(dist[np.argmin(our_jy)] - dig_x[np.argmin(dig_jy)]) < 0.02
    # sign structure: positive near the start, one crossing into the
    # negative lobe, recovery toward zero at the far end — crossing
    # position within 20 mm of the digitized curve's
    def crossing(x, y):
        s = np.sign(y)
        idx = np.nonzero((s[:-1] > 0) & (s[1:] <= 0) & (x[:-1] > 0.02))[0]
        return x[idx[0]] if len(idx) else None
    ours, digs = crossing(dist, our_jy), crossing(dig_x, dig_jy)
    assert ours is not None and digs is not None
    assert abs(ours - digs) < 0.02


def test_line_y_jx_spike_matches_elmer(elmer):
    """Line Y's dominant feature: the -J_x edge spike at y -> 0 (published
    ~ -1.6e5..-1.9e5 A/m^2 across the two codes' drawn corridor)."""
    dig, lines = elmer
    our_jx = lines["lineY"][0]
    assert our_jx.min() < -1.1e5
    assert our_jx.min() >= 1.05 * float(dig["lineY_Jx_trough"])
    # away from the spike the component is small and slightly positive by
    # mid-line, as in the published curve
    dist = lines["dist"]
    elm = np.interp(dist, dig["lineY_dist"], dig["lineY_Jx"])
    m = dist >= 0.02
    scale = float(dig["lineY_Jm_peak"])
    assert np.abs(our_jx - elm)[m].max() / scale < 0.12   # measured 0.053
