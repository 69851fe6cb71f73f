#!/usr/bin/env python
"""Generate the shipped example .vxc cases (synthetic geometries shaped like
the reference's three workloads) plus a runner script.

Usage: python examples/generate.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eddy_currents_3d_tpu.testing.cases import case_lim, case_moving, case_static


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.abspath(__file__))
    cases = {
        # full-size stand-ins for the reference workloads
        "static_plate.vxc": case_static(shape_xyz=(64, 64, 20), steps=100,
                                        dt=1e-3, jump=1e-2),
        "moving_coil.vxc": case_moving(shape_xyz=(64, 64, 20), steps=100, dt=4e-4),
        "lim.vxc": case_lim(shape_xyz=(96, 24, 16), steps=200, dt=1e-3),
    }
    for name, text in cases.items():
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            f.write(text)
        print("wrote", path)


if __name__ == "__main__":
    main()
