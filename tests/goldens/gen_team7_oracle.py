"""Generate the production-scale *independent-oracle* golden trajectory.

Runs the per-cell Fortran-style oracle transcription (tests/oracle.py —
assembly AND time loop deliberately structured like the reference,
EC3D.f90:241-455, and fully independent of the framework's vectorized
assembler / jitted step) on the real TEAM7-modified geometry
(/root/reference/src/compare_to_Elmer.vxc, 102x102x24 cells) and stores
state snapshots at steps 3, 10 and 17 (t = 0.017 s is the reference's
published validation time, README.md:113-129).

Provenance note: tests/goldens/team7_10step.npz is the framework's *own*
f64 output (a fast regression pin); THIS file is the independent anchor —
a production-shape bug shared by the framework step and its golden
generation cannot hide from it.

Usage: python tests/goldens/gen_team7_oracle.py [steps]   (default 17)
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))                   # tests/ (oracle)
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

VXC = "/root/reference/src/compare_to_Elmer.vxc"
SNAPSHOT_STEPS = (3, 10, 17)


def main() -> int:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 17

    import jax
    jax.config.update("jax_platforms", "cpu")

    from eddy_currents_3d_tpu.models.vxc import read_vxc
    from oracle import OracleSimulator

    t0 = time.time()
    model = read_vxc(VXC)
    print(f"[{time.time()-t0:8.1f}s] model loaded: shape_xyz={model.shape_xyz} "
          f"n_cond={model.n_cond}", flush=True)
    sim = OracleSimulator(model)
    print(f"[{time.time()-t0:8.1f}s] oracle matrix assembled: "
          f"n={sim.n} nnz={sim.A.nnz}", flush=True)

    snaps = {}

    def on_step(idx, Uaf, Jaf, it):
        print(f"[{time.time()-t0:8.1f}s] step {idx}: {it} iterations",
              flush=True)
        if idx in SNAPSHOT_STEPS:
            snaps[f"U_{idx}"] = Uaf.copy()
            snaps[f"J_{idx}"] = Jaf.copy()

    Uaf, Jaf, iters = sim.run(steps, on_step=on_step)

    out = os.path.join(HERE, "team7_oracle.npz")
    np.savez_compressed(
        out,
        iters=np.asarray(iters),
        steps=np.asarray(SNAPSHOT_STEPS[: max(i for i, s in
                         enumerate(SNAPSHOT_STEPS, 1) if s <= steps)]),
        N=np.asarray(sim.N),
        tolerance=np.asarray(model.solver.tolerance),
        **snaps,
    )
    print(f"[{time.time()-t0:8.1f}s] wrote {out} "
          f"({os.path.getsize(out)/1e6:.1f} MB)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
