"""Checkpoint / resume for the simulation loop.

The reference has no restart capability (SURVEY §5); the restartable state
is exactly: the solution vector ``Uaf`` (A, U), the inertial history
``Jaf`` (carry), per-function motion state (Distance + the global movestop
latch), and the time/step/output counters.  A checkpoint is one
``.npz`` with those arrays plus a config fingerprint so a resume against a
different model or dtype fails loudly instead of silently diverging.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np

from .motion import MotionState
from .simulate import SimState

__all__ = ["save_checkpoint", "load_checkpoint", "model_fingerprint", "latest_checkpoint"]

_FORMAT = 1


def model_fingerprint(model) -> str:
    """Cheap structural hash of everything that must match across a resume."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(model.geo).tobytes())
    meta = {
        "shape": model.shape_xyz,
        "delta": [float(d) for d in model.delta],
        "dt": model.tran.step,
        "stop": model.tran.stop,
        "jump": model.tran.jump,
        "tol": model.solver.tolerance,
        "itmax": model.solver.itmax,
        "bound": model.solver.bound,
        "bnd": np.asarray(model.solver.BND).tolist(),
        "domains": [(d.ident, d.D, d.C, list(d.Ve)) for d in model.domains],
        "functions": [
            (f.name, f.direction, f.domain, f.expression.source,
             list(f.arg_names), [float(v) for v in f.arg_values],
             list(f.move), list(f.vmech_index), [float(v) for v in f.vmech_const])
            for f in model.functions
        ],
        "vmech": [(v.name, v.expression.source) for v in model.vmech],
    }
    h.update(json.dumps(meta, sort_keys=True).encode())
    return h.hexdigest()


def save_checkpoint(path: str, state: SimState, step_index: int, npoint: int,
                    fingerprint: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    extra = {}
    if state.prev is not None:   # extrapolated-warm-start history
        extra = {"prevA": np.asarray(state.prev.A),
                 "prevU": np.asarray(state.prev.U)}
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        format=np.int64(_FORMAT),
        A=np.asarray(state.A),
        U=np.asarray(state.U),
        carry=np.asarray(state.carry),
        distance=np.asarray(state.motion.distance),
        movestop=np.asarray(state.motion.movestop),
        motion_comp=np.asarray(state.motion.comp),
        step_index=np.int64(step_index),
        npoint=np.int64(npoint),
        fingerprint=np.frombuffer(fingerprint.encode(), np.uint8),
        **extra,
    )
    # numpy appends .npz to the tmp name
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load_checkpoint(path: str, fingerprint: str, dtype=None):
    """Returns (SimState, step_index, npoint).  Raises on config mismatch."""
    z = np.load(path)
    if int(z["format"]) != _FORMAT:
        raise ValueError(f"unsupported checkpoint format {int(z['format'])}")
    stored = bytes(z["fingerprint"]).decode()
    if stored != fingerprint:
        raise ValueError(
            "checkpoint was written for a different model/config "
            f"(stored {stored[:12]}..., current {fingerprint[:12]}...)"
        )
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    from ..assembly.stencil import State
    state = SimState(
        A=cast(z["A"]),
        U=cast(z["U"]),
        carry=cast(z["carry"]),
        motion=MotionState(
            distance=jnp.asarray(z["distance"]),
            movestop=jnp.asarray(z["movestop"]),
            # pre-Kahan checkpoints carry no compensation: resume with 0
            comp=(jnp.asarray(z["motion_comp"]) if "motion_comp" in z.files
                  else jnp.zeros_like(jnp.asarray(z["distance"]))),
        ),
        prev=(State(cast(z["prevA"]), cast(z["prevU"]))
              if "prevA" in z.files else None),
    )
    return state, int(z["step_index"]), int(z["npoint"])


def latest_checkpoint(directory: str):
    """Newest ckpt_<step>.npz in a directory, or None."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith("ckpt_") and name.endswith(".npz"):
            try:
                step = int(name[5:-4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
