"""Block stencil (DIA) operator — the TPU-native form of the global matrix.

The reference assembles one global CSR matrix over unknowns
``[Ax | Ay | Az | U]`` (EC3D.f90:465-1049) and applies it with a gather-based
SpMV (solvers.f90:54-61).  Gathers are hostile to the TPU memory system, so
here the same linear operator is stored as *dense per-offset coefficient
fields* over the voxel grid and applied as a fused sum of shifted
multiply-adds — a pure HBM-streaming computation that XLA fuses into a
single pass and that shards trivially over a device mesh (z-slab sharding;
the shifts along z become collective permutes).

Blocks (see assemble.py for how they are filled):

* ``ka``  (7, nz, ny, nx)    — the A-row stencil, *shared* by Ax/Ay/Az
  (the reference uses identical rows for the three components,
  EC3D.f90:645-665).  Offset order: [0, -x, +x, -y, +y, -z, +z].
* ``gu``  (3, 5, nz, ny, nx) — grad-U coupling into the A_c row; offsets
  [-2, -1, 0, +1, +2] along axis c (central or one-sided (-3,+4,-1)
  conductor-surface stencils, EC3D.f90:667-710).
* ``ku``  (7, nz, ny, nx)    — U-row Laplacian on U (EC3D.f90:766-921).
* ``da``  (3, 3, nz, ny, nx) — U-row div(dA/dt) coupling into A_c; offsets
  [-1, 0, +1] along axis c (EC3D.f90:918-921 and the boundary-case
  same-cell couplings).

U is stored dense on the grid but only conducting cells carry unknowns; all
coefficients touching non-conducting U cells are zero by construction, so
BiCGSTAB on the dense state is exactly the reference iteration on the
embedded CSR system (padding entries stay identically zero).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ["State", "StencilOperator", "shift"]

# array axes for (..., z, y, x)
_AXIS = {0: -1, 1: -2, 2: -3}  # physical axis (x,y,z) -> array axis


def shift(f: jax.Array, axis: int, d: int) -> jax.Array:
    """Neighbor gather: ``out[c] = f[c + d * unit(axis)]``, zero beyond the
    grid.  ``axis`` is the physical axis (0=x, 1=y, 2=z); ``d`` static."""
    if d == 0:
        return f
    ax = _AXIS[axis] % f.ndim
    n = f.shape[ax]
    if abs(d) >= n:
        return jnp.zeros_like(f)
    src = [slice(None)] * f.ndim
    pad = [(0, 0)] * f.ndim
    if d > 0:
        src[ax] = slice(d, None)
        pad[ax] = (0, d)
    else:
        src[ax] = slice(None, d)
        pad[ax] = (-d, 0)
    return jnp.pad(f[tuple(src)], pad)


# canonical 7-point offset list used by ka/ku: index -> (axis, d)
OFFSETS7 = ((None, 0), (0, -1), (0, +1), (1, -1), (1, +1), (2, -1), (2, +1))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class State:
    """The unknown vector as grid fields: A (3, nz, ny, nx) and U (nz, ny, nx)."""

    A: jax.Array
    U: jax.Array

    # -- vector-space helpers (used by the Krylov solver) --
    def __add__(self, o):  return State(self.A + o.A, self.U + o.U)
    def __sub__(self, o):  return State(self.A - o.A, self.U - o.U)
    def scale(self, a):    return State(a * self.A, a * self.U)
    def axpy(self, a, o):  return State(self.A + a * o.A, self.U + a * o.U)

    def dot(self, o) -> jax.Array:
        return jnp.vdot(self.A, o.A) + jnp.vdot(self.U, o.U)

    def norm(self) -> jax.Array:
        return jnp.sqrt(self.dot(self))

    @staticmethod
    def zeros(shape_zyx, dtype=jnp.float32) -> "State":
        nz, ny, nx = shape_zyx
        return State(jnp.zeros((3, nz, ny, nx), dtype), jnp.zeros((nz, ny, nx), dtype))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StencilOperator:
    ka: jax.Array   # (7, nz, ny, nx)
    gu: jax.Array   # (3, 5, nz, ny, nx)
    ku: jax.Array   # (7, nz, ny, nx)
    da: jax.Array   # (3, 3, nz, ny, nx)

    @property
    def shape_zyx(self):
        return self.ka.shape[1:]

    @property
    def dtype(self):
        return self.ka.dtype

    def apply(self, x: State) -> State:
        """y = A @ x (the full coupled operator)."""
        # A rows: shared 7-point stencil over each component...
        yA = self.ka[0][None] * x.A
        for o, (axis, d) in enumerate(OFFSETS7):
            if o == 0:
                continue
            yA = yA + self.ka[o][None] * shift(x.A, axis, d)
        # ... plus grad-U coupling (component c differentiates U along c)
        gu_terms = []
        for c in range(3):
            t = self.gu[c, 2] * x.U
            for k, d in ((0, -2), (1, -1), (3, +1), (4, +2)):
                t = t + self.gu[c, k] * shift(x.U, c, d)
            gu_terms.append(t)
        yA = yA + jnp.stack(gu_terms)

        # U rows: Laplacian on U + div coupling into A
        yU = self.ku[0] * x.U
        for o, (axis, d) in enumerate(OFFSETS7):
            if o == 0:
                continue
            yU = yU + self.ku[o] * shift(x.U, axis, d)
        yU = yU + self.apply_div(x.A)
        return State(yA, yU)

    def apply_div(self, A: jax.Array) -> jax.Array:
        """Only the U-row -> A-column coupling (used for the per-step RHS:
        the reference moves these terms times the old solution to the right
        hand side, EC3D.f90:385-392)."""
        yU = jnp.zeros(A.shape[1:], A.dtype)
        for c in range(3):
            yU = yU + self.da[c, 1] * A[c]
            yU = yU + self.da[c, 0] * shift(A[c], c, -1)
            yU = yU + self.da[c, 2] * shift(A[c], c, +1)
        return yU

    def diagonal(self) -> State:
        """Operator diagonal as a State (for Jacobi preconditioning).
        Non-conducting U rows have no unknown; report 1 there."""
        dU = jnp.where(self.ku[0] == 0, jnp.ones_like(self.ku[0]), self.ku[0])
        return State(jnp.broadcast_to(self.ka[0][None], (3,) + tuple(self.ka.shape[1:])), dU)

    def astype(self, dtype) -> "StencilOperator":
        return StencilOperator(
            self.ka.astype(dtype), self.gu.astype(dtype),
            self.ku.astype(dtype), self.da.astype(dtype),
        )
