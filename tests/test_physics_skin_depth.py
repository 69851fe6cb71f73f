"""Physics validation against a closed-form solution (no self-reference).

A sinusoidally-driven current sheet above a thick conducting slab sets up,
at periodic steady state, the classic skin-effect profile inside the slab:

    A_x(z, t) = Re[ a * exp(kappa * z) * e^{i omega t} ],
    kappa = (1 + i) / delta,   delta = sqrt(2 / (mu0 * sigma * omega))

This pins the whole pipeline — vxc parse, mu0*sigma scaling, trapezoidal
time stepping, the conducting-cell coupling — to textbook electrodynamics
rather than to the test oracle (the role the ElmerFEM TEAM7 cross-check
plays for the reference, README.md:89-129; no Elmer/Fortran exists in this
image, but the skin problem has an exact answer).

Method: two snapshots a quarter period apart give the complex phasor
u(z) = A(t1) + i*A(t1 - T/4) at the slab's center column.  The finite slab
leaks a smooth background field around its edges (it is not an infinite
half-space), so u is fit to  a * exp(kappa z) + b  with kappa swept over
candidate skin depths — the complex constant b absorbs the leakage, and
the single complex exponential couples the amplitude decay AND the phase
lag to one delta.  Measured recovery on this grid: delta to ~1%; the
assertion allows 7% (a factor-sqrt(2) sigma/dt/C error shifts delta 41%).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eddy_currents_3d_tpu.sim.simulate import Simulation
from eddy_currents_3d_tpu.testing.cases import make_vxc_text, _grid, load_case

MU0 = 4e-7 * np.pi


def test_skin_depth_against_analytic():
    nx, ny, nz = 32, 32, 30
    h = 2e-3
    freq = 50.0
    omega = 2 * np.pi * freq
    delta = 3 * h                               # 3 cells per skin depth
    sigma = 2.0 / (MU0 * omega * delta**2)

    slab_lo, slab_hi, sheet_k = 8, 20, 24       # slab 12 cells = 4 delta
    geo = _grid((nx, ny, nz))
    geo[slab_lo:slab_hi, 1:ny - 1, 1:nx - 1] = 1
    geo[sheet_k, :, :] = 2                      # x-directed source sheet
    spp = 16                                    # steps per period
    dt = 1.0 / freq / spp
    n_steps = int(2.5 * spp)                    # transient dies in ~0.2 T
    names = [
        f"slab D=1 C='mu0*{sigma!r}'",
        "sheet D=1 SRCx=Fs",
        f"param tran stop={(n_steps + 0.5) * dt!r} step={dt!r}",
        "p2 solver tol=5e-4 itmax=4000",
        f"f1 func Fs=a*cos(p2*f*t) a='1000/(dx*dz)' p2='2*pi' f={freq} t=t",
    ]
    model = load_case(make_vxc_text((nx, ny, nz), h, names, geo.ravel()))
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64,
                     donate=False, precond="cheb")

    grab = {n_steps - 1 - spp // 4: None, n_steps - 1: None}   # T/4 apart
    state = sim.init_state()
    for idx in range(n_steps):
        state, info = sim._step_jit(state, sim.steps[idx][0])
        # the cold-start solves of this Poisson-dominated field stall near
        # ~1e-3 on every method (unpreconditioned/jacobi/cheb/mg); that
        # error is part of the physical transient and decays well before
        # the measurement — warm steps must converge fully
        assert float(info.relres) < 2e-3
        if idx >= 4:
            assert bool(info.converged)
        if idx in grab:
            grab[idx] = np.asarray(state.A[0])   # A_x

    cx, cy = nx // 2, ny // 2
    u = (grab[n_steps - 1][:, cy, cx]
         + 1j * grab[n_steps - 1 - spp // 4][:, cy, cx])

    ks = np.arange(slab_lo + 2, slab_hi)         # in-slab fit window
    uu = u[ks]

    def residual(dcand):
        e = np.exp((1 + 1j) / dcand * (ks * h))
        M = np.stack([e, np.ones_like(e)], 1)
        coef, *_ = np.linalg.lstsq(M, uu, rcond=None)
        return float(np.abs(uu - M @ coef).sum())

    cands = np.linspace(0.5 * delta, 2.0 * delta, 301)
    res = np.array([residual(d) for d in cands])
    delta_fit = cands[res.argmin()]

    assert delta_fit == pytest.approx(delta, rel=0.07), \
        f"fitted skin depth {delta_fit * 1e3:.3f} mm vs analytic {delta * 1e3:.3f} mm"
    # the minimum is sharp: a 25%-off delta fits far worse
    assert res.min() < 0.3 * residual(0.75 * delta)
    assert res.min() < 0.3 * residual(1.33 * delta)
    # and the wave genuinely decays across the slab
    assert np.abs(u[slab_hi - 1]) / np.abs(u[slab_lo + 4]) > 5.0
