"""TEAM7-modified validation line profiles (the reference's acceptance
artifact, README.md:113-129).

Extracts the eddy-current density J = -(1/mu0) * carry (the quantity the
reference writes as ``Vector_field_eddy``, utilites.f90:239) along the two
published surface lines at t = 0.017 s:

* **Line X**: along x at 160 mm from the plate's bottom edge (20 mm below
  the hole), on the plate top layer;
* **Line Y**: along y at 140 mm from the plate's left edge (20 mm right of
  the hole), on the plate top layer.

Line positions are pixel-measured from the reference's dimensioned drawing
(img/domain_size.jpg: plate 300x300 mm spans 225 px at 0.75 px/mm; the
Line X axis sits 120 px = 160 mm above the plate bottom; Line Y sits 20 mm
right of the hole edge per the 20|100|20 dimension chain).  Both positions
fall exactly on voxel-cell boundaries (y = 54*delta, x = 48*delta), so the
profile is the mean of the two adjacent cell rows — the same value linear
point interpolation gives at the exact millimetre position.

Outputs (committed as goldens):
* team7_lines.npz — distance coordinate + (3, 90) J vectors per line
* team7_lines.png — the two panels, styled like the reference's Fig. 5
  (same series colors, so a human can overlay them on
  img/valid_Line_Xa.jpg / valid_Line_Ya.jpg)

Usage: python docs/validation/gen_team7_lines.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))

VXC = "/root/reference/src/compare_to_Elmer.vxc"
MU0 = 4e-7 * np.pi
STEPS = 17           # dt = 1 ms -> t = 0.017 s after step 17
ZTOP = 7             # top conducting layer (plate z cells 2..7)
PLATE = slice(6, 96)  # plate x/y cells (300 mm)
ROW_X = (53, 54)     # Line X: rows straddling y = 54*delta (160 mm)
COL_Y = (47, 48)     # Line Y: cols straddling x = 48*delta (140 mm)


def compute_lines():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from eddy_currents_3d_tpu.models.vxc import read_vxc
    from eddy_currents_3d_tpu.sim.simulate import Simulation

    model = read_vxc(VXC)
    sim = Simulation(model, dtype=jnp.float64, dot_dtype=jnp.float64)
    state = sim.init_state()
    for t, _ in sim.steps[:STEPS]:
        state, info = sim._step_jit(state, t)
        assert bool(info.converged)
    return lines_from_carry(np.asarray(state.carry),
                            np.asarray(model.cond_mask),
                            float(model.delta[0]))


def lines_from_carry(carry, cond_mask, delta):
    """(distance, lineX (3,90), lineY (3,90)) from a (3,nz,ny,nx) carry."""
    J = -(carry / MU0) * cond_mask[None]
    Jt = J[:, ZTOP]
    lineX = 0.5 * (Jt[:, ROW_X[0], PLATE] + Jt[:, ROW_X[1], PLATE])
    lineY = 0.5 * (Jt[:, PLATE, COL_Y[0]] + Jt[:, PLATE, COL_Y[1]])
    dist = (np.arange(90) + 0.5) * delta
    return dist, lineX, lineY


def plot(dist, lineX, lineY, path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2))
    # series colors follow the reference's published Fig. 5 exactly so the
    # curves can be overlaid on img/valid_Line_*.jpg
    for ax, (name, prof) in zip(axes, (("Line Y", lineY), ("Line X", lineX))):
        Jm = np.sqrt((prof ** 2).sum(0))
        ax.plot(dist, Jm, color="#0000cc", lw=2, label="Jm")
        ax.plot(dist, prof[0], color="#00cccc", lw=2, label="Jx")
        ax.plot(dist, prof[1], color="#cc0000", lw=2, label="Jy")
        for series, curve in (("Jm", Jm), ("Jx", prof[0]), ("Jy", prof[1])):
            i = int(np.argmax(np.abs(curve[5:-5]))) + 5
            ax.annotate(series, (dist[i], curve[i]),
                        textcoords="offset points", xytext=(8, 6))
        ax.set_xlabel(f"{name}, m")
        ax.set_ylabel("J, A/m^2")
        ax.set_title(f"eddy current density along {name} (t = 0.017 s)")
        ax.grid(True, alpha=0.3)
        ax.legend(loc="upper right")
    fig.suptitle("TEAM7-modified validation profiles "
                 "(cf. reference img/valid_Line_Ya.jpg / valid_Line_Xa.jpg)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)


def main() -> int:
    dist, lineX, lineY = compute_lines()
    np.savez(os.path.join(HERE, "team7_lines.npz"),
             dist=dist, lineX=lineX, lineY=lineY,
             t=0.017, z_layer=ZTOP,
             lineX_mm_from_plate_bottom=160.0,
             lineY_mm_from_plate_left=140.0)
    plot(dist, lineX, lineY, os.path.join(HERE, "team7_lines.png"))
    print("wrote team7_lines.npz / team7_lines.png")
    print(f"Line X: |J| max {np.abs(lineX).max():.4g} A/m^2; "
          f"Line Y: |J| max {np.abs(lineY).max():.4g} A/m^2")
    return 0


if __name__ == "__main__":
    sys.exit(main())
