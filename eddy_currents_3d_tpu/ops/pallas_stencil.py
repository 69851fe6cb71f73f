"""Fused Pallas TPU kernels for the block stencil matvec.

Why: the matvec's ±1-cell shifts along the minor (lane) dimension are
pathological for plain XLA — measured ~550 us/matvec on a 250k-cell grid vs
~2 us for an elementwise pass (cross-lane movement materializes through
HBM).  Inside a Pallas kernel the same shifts are single-instruction VPU
lane/sublane rolls on VMEM-resident planes, so the matvec streams each
operand exactly once.

Layout: fields are zero-padded to (nz, NYp, NXp) with NXp a lane multiple
(128) and NYp a sublane multiple (8).  Correctness of the rolls relies on
the same invariant as the flat-roll XLA path (assembly/stencil.py): every
coefficient that would touch a rolled-wrapped or padded value is zero by
construction — grid-face rows drop their outward neighbor
(EC3D.f90:528-643), padding rows carry zero coefficients, and the
conductor-box fields are zero within the 2-cell halo of the box faces.

Two kernels, both gridded over z-planes with neighbor planes passed via
clamped index maps (the clamped duplicate plane is multiplied by a zero
coefficient at the boundary):

* A-block: the shared 7-point stencil applied to all three components.
* U-coupling: grad-U into the A rows (5 offsets along each axis), the U-row
  Laplacian, and the div(dA/dt) coupling — fused into one pass over the
  conductor box.

The solver runs entirely in padded space (padded entries stay exactly zero
through BiCGSTAB: zero coefficients keep matvec outputs zero, axpy keeps
zeros zero, dots are unaffected), so padding costs one pad/unpad per solve.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..assembly.stencil import State

__all__ = ["PallasStencilOperator", "from_assembled", "pallas_available"]

# set True in tests to run kernels in interpreter mode (works on CPU)
INTERPRET = False

_LANE = 128
_SUB = 8


def pallas_available() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad3(arr: np.ndarray, NYp: int, NXp: int) -> np.ndarray:
    """Zero-pad the trailing (y, x) dims."""
    pad = [(0, 0)] * (arr.ndim - 2) + [(0, NYp - arr.shape[-2]), (0, NXp - arr.shape[-1])]
    return np.pad(arr, pad)


def _i32map(f):
    """Force a BlockSpec index map to yield int32 indices: under x64 mode
    Python-int constants in the map trace as i64 and Mosaic rejects the
    mixed (i64, i32, ...) index tuple."""
    return lambda z: tuple(jnp.asarray(v, jnp.int32) for v in f(z))


def _roll(x, shift, axis):
    # normalize to a non-negative shift; result[i] = x[(i - shift) mod n]
    # int32: tpu.dynamic_rotate requires an i32 shift (x64 mode would trace
    # a bare Python int as i64 and fail MLIR verification)
    return pltpu.roll(x, jnp.int32(shift % x.shape[axis]), axis=axis)


# ---------------------------------------------------------------------------
# A-block kernel: y[c] = sum_7 ka_o * shift_o(A[c]) for c in 0..2
# ---------------------------------------------------------------------------

def _a_kernel(ka_ref, am_ref, a0_ref, ap_ref, out_ref):
    a0 = a0_ref[:, 0]                 # (3, NYp, NXp)
    y = ka_ref[0, 0][None] * a0
    y += ka_ref[1, 0][None] * _roll(a0, 1, 2)    # -x neighbor
    y += ka_ref[2, 0][None] * _roll(a0, -1, 2)   # +x neighbor
    y += ka_ref[3, 0][None] * _roll(a0, 1, 1)    # -y
    y += ka_ref[4, 0][None] * _roll(a0, -1, 1)   # +y
    y += ka_ref[5, 0][None] * am_ref[:, 0]       # -z
    y += ka_ref[6, 0][None] * ap_ref[:, 0]       # +z
    out_ref[:, 0] = y


def _apply_a(ka_p: jax.Array, A_p: jax.Array) -> jax.Array:
    nz, NYp, NXp = A_p.shape[1:]
    plane = lambda *lead: pl.BlockSpec(
        lead + (1, NYp, NXp),
        _i32map(lambda z, _n=len(lead): (0,) * _n + (z, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    a_at = lambda fz: pl.BlockSpec(
        (3, 1, NYp, NXp), _i32map(lambda z: (0, fz(z), 0, 0)), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _a_kernel,
        grid=(nz,),
        in_specs=[
            plane(7),
            a_at(lambda z: jnp.maximum(z - 1, 0)),
            a_at(lambda z: z),
            a_at(lambda z: jnp.minimum(z + 1, nz - 1)),
        ],
        out_specs=a_at(lambda z: z),
        out_shape=jax.ShapeDtypeStruct(A_p.shape, A_p.dtype),
        interpret=INTERPRET,
    )(ka_p, A_p, A_p, A_p)


# ---------------------------------------------------------------------------
# U-coupling kernel over the conductor box:
#   gout[c] = sum_5 gu[c,k] * shift_k_along_c(U)
#   uout    = sum_7 ku_o * shift_o(U) + sum_c sum_3 da[c,k] * shift_k_along_c(A[c])
# ---------------------------------------------------------------------------

def _u_kernel(gu_ref, ku_ref, da_ref,
              um2_ref, um1_ref, u0_ref, up1_ref, up2_ref,
              abm_ref, ab0_ref, abp_ref,
              gout_ref, uout_ref):
    u0 = u0_ref[0]                   # (BY, BX)
    gx = (gu_ref[0, 2, 0] * u0
          + gu_ref[0, 1, 0] * _roll(u0, 1, 1) + gu_ref[0, 3, 0] * _roll(u0, -1, 1)
          + gu_ref[0, 0, 0] * _roll(u0, 2, 1) + gu_ref[0, 4, 0] * _roll(u0, -2, 1))
    gy = (gu_ref[1, 2, 0] * u0
          + gu_ref[1, 1, 0] * _roll(u0, 1, 0) + gu_ref[1, 3, 0] * _roll(u0, -1, 0)
          + gu_ref[1, 0, 0] * _roll(u0, 2, 0) + gu_ref[1, 4, 0] * _roll(u0, -2, 0))
    gz = (gu_ref[2, 2, 0] * u0
          + gu_ref[2, 1, 0] * um1_ref[0] + gu_ref[2, 3, 0] * up1_ref[0]
          + gu_ref[2, 0, 0] * um2_ref[0] + gu_ref[2, 4, 0] * up2_ref[0])
    gout_ref[0, 0] = gx
    gout_ref[1, 0] = gy
    gout_ref[2, 0] = gz

    yu = (ku_ref[0, 0] * u0
          + ku_ref[1, 0] * _roll(u0, 1, 1) + ku_ref[2, 0] * _roll(u0, -1, 1)
          + ku_ref[3, 0] * _roll(u0, 1, 0) + ku_ref[4, 0] * _roll(u0, -1, 0)
          + ku_ref[5, 0] * um1_ref[0] + ku_ref[6, 0] * up1_ref[0])
    ax, ay, az = ab0_ref[0, 0], ab0_ref[1, 0], ab0_ref[2, 0]
    yu += (da_ref[0, 1, 0] * ax
           + da_ref[0, 0, 0] * _roll(ax, 1, 1) + da_ref[0, 2, 0] * _roll(ax, -1, 1))
    yu += (da_ref[1, 1, 0] * ay
           + da_ref[1, 0, 0] * _roll(ay, 1, 0) + da_ref[1, 2, 0] * _roll(ay, -1, 0))
    yu += da_ref[2, 1, 0] * az + da_ref[2, 0, 0] * abm_ref[2, 0] + da_ref[2, 2, 0] * abp_ref[2, 0]
    uout_ref[0] = yu


def _apply_u(gu_p, ku_p, da_p, Ub_p, Ab_p):
    bz, BYp, BXp = Ub_p.shape
    u_at = lambda fz: pl.BlockSpec(
        (1, BYp, BXp), _i32map(lambda z: (fz(z), 0, 0)), memory_space=pltpu.VMEM
    )
    a_at = lambda fz: pl.BlockSpec(
        (3, 1, BYp, BXp), _i32map(lambda z: (0, fz(z), 0, 0)), memory_space=pltpu.VMEM
    )
    lead = lambda *ld: pl.BlockSpec(
        ld + (1, BYp, BXp),
        _i32map(lambda z, _n=len(ld): (0,) * _n + (z, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    lo = lambda d: (lambda z: jnp.maximum(z - d, 0))
    hi = lambda d: (lambda z: jnp.minimum(z + d, bz - 1))
    gout, uout = pl.pallas_call(
        _u_kernel,
        grid=(bz,),
        in_specs=[
            lead(3, 5), lead(7), lead(3, 3),
            u_at(lo(2)), u_at(lo(1)), u_at(lambda z: z), u_at(hi(1)), u_at(hi(2)),
            a_at(lo(1)), a_at(lambda z: z), a_at(hi(1)),
        ],
        out_specs=(a_at(lambda z: z), u_at(lambda z: z)),
        out_shape=(
            jax.ShapeDtypeStruct(Ab_p.shape, Ab_p.dtype),
            jax.ShapeDtypeStruct(Ub_p.shape, Ub_p.dtype),
        ),
        interpret=INTERPRET,
    )(gu_p, ku_p, da_p, Ub_p, Ub_p, Ub_p, Ub_p, Ub_p, Ab_p, Ab_p, Ab_p)
    return gout, uout


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PallasStencilOperator:
    """Padded-layout operator with a fused-kernel apply.

    Operates on *padded* State ((3, nz, NYp, NXp) / (nz, NYp, NXp)); use
    :meth:`pad_state` / :meth:`unpad_state` at the solve boundary."""

    ka_p: jax.Array                 # (7, nz, NYp, NXp)
    gu_p: jax.Array                 # (3, 5, bz, BYp, BXp)
    ku_p: jax.Array                 # (7, bz, BYp, BXp)
    da_p: jax.Array                 # (3, 3, bz, BYp, BXp)
    shape_zyx: tuple = dc_field(metadata=dict(static=True))
    box: Optional[tuple] = dc_field(metadata=dict(static=True), default=None)

    @property
    def padded_zyx(self):
        return self.ka_p.shape[1:]

    def pad_state(self, x: State) -> State:
        nz, ny, nx = self.shape_zyx
        _, NYp, NXp = self.padded_zyx
        pad = [(0, 0), (0, NYp - ny), (0, NXp - nx)]
        return State(jnp.pad(x.A, [(0, 0)] + pad), jnp.pad(x.U, pad))

    def unpad_state(self, x: State) -> State:
        nz, ny, nx = self.shape_zyx
        return State(x.A[:, :, :ny, :nx], x.U[:, :ny, :nx])

    def apply(self, x: State) -> State:
        """y = A @ x on padded fields."""
        yA = _apply_a(self.ka_p, x.A)
        if self.box is None:
            return State(yA, jnp.zeros_like(x.U))
        z0, z1, y0, _, x0, _ = self.box
        bz, BYp, BXp = self.ku_p.shape[1:]
        Ub = jax.lax.dynamic_slice(x.U, (z0, y0, x0), (bz, BYp, BXp))
        Ab = jax.lax.dynamic_slice(x.A, (0, z0, y0, x0), (3, bz, BYp, BXp))
        gout, uout = _apply_u(self.gu_p, self.ku_p, self.da_p, Ub, Ab)
        yA = jax.lax.dynamic_update_slice(
            yA, jax.lax.dynamic_slice(yA, (0, z0, y0, x0), gout.shape) + gout,
            (0, z0, y0, x0),
        )
        yU = jax.lax.dynamic_update_slice(jnp.zeros_like(x.U), uout, (z0, y0, x0))
        return State(yA, yU)


def from_assembled(system, model=None) -> PallasStencilOperator:
    """Build the padded Pallas operator from an AssembledSystem.

    The grid pads (y, x) to sublane/lane multiples.  The conductor box pads
    the same way; because padding extends the box only on the +y/+x sides
    with zero coefficients, the box slice may exceed the padded grid — so
    the box *origin* is shifted back when needed and the coefficient arrays
    re-padded on the low side accordingly (zero coefficients keep the extra
    cells inert)."""
    op = system.op
    nz, ny, nx = op.shape_zyx
    NYp, NXp = _pad_to(ny, _SUB), _pad_to(nx, _LANE)
    dtype = op.ka.dtype
    ka_p = jnp.asarray(_pad3(np.asarray(system.np_ka), NYp, NXp), dtype)

    if op.box is None:
        return PallasStencilOperator(
            ka_p=ka_p,
            gu_p=jnp.zeros((3, 5, 0, 0, 0), dtype),
            ku_p=jnp.zeros((7, 0, 0, 0), dtype),
            da_p=jnp.zeros((3, 3, 0, 0, 0), dtype),
            shape_zyx=(nz, ny, nx),
            box=None,
        )

    z0, z1, y0, y1, x0, x1 = op.box
    by, bx = y1 - y0, x1 - x0
    BYp, BXp = _pad_to(by, _SUB), _pad_to(bx, _LANE)
    # keep the (y,x) window inside the padded grid: move the origin back if
    # the padded window would overrun, growing the low-side zero margin
    y0n = min(y0, NYp - BYp)
    x0n = min(x0, NXp - BXp)
    ly, lx = y0 - y0n, x0 - x0n   # extra low-side zero margin

    def box_pad(full: np.ndarray) -> np.ndarray:
        win = full[..., z0:z1, y0:y1, x0:x1]
        pad = [(0, 0)] * (full.ndim - 3) + [
            (0, 0), (ly, BYp - by - ly), (lx, BXp - bx - lx)
        ]
        return np.pad(win, pad)

    return PallasStencilOperator(
        ka_p=ka_p,
        gu_p=jnp.asarray(box_pad(np.asarray(system.np_gu)), dtype),
        ku_p=jnp.asarray(box_pad(np.asarray(system.np_ku)), dtype),
        da_p=jnp.asarray(box_pad(np.asarray(system.np_da)), dtype),
        shape_zyx=(nz, ny, nx),
        box=(z0, z1, y0n, y0n + BYp, x0n, x0n + BXp),
    )
