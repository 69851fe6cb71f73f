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

Two kernels, both gridded over (z-plane, y-tile) with neighbor blocks passed
via clamped index maps (the clamped duplicate block is multiplied by a zero
coefficient at the boundary).  The y-tile height adapts to the row width so
each grid step's working set fits VMEM (~16 MB/core) at any grid size;
y-shifts across tile boundaries stitch edge rows from the jy +- 1 neighbor
blocks:

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


def _clamp(v, n):
    """0 <= v <= n-1 for index maps, via max/min with Python-int bounds:
    jnp.clip embeds its bounds as i64 constants under x64 and emits a
    scalar i64->i32 convert that Mosaic cannot lower (it recurses in
    _convert_helper); maximum/minimum keep weak Python ints at i32."""
    return jnp.minimum(jnp.maximum(v, 0), n - 1)


def _i32map(f):
    """Force a BlockSpec index map to yield int32 indices: under x64 mode
    Python-int constants in the map trace as i64 and Mosaic rejects the
    mixed (i64, i32, ...) index tuple."""
    return lambda *g: tuple(jnp.asarray(v, jnp.int32) for v in f(*g))


def _roll(x, shift, axis):
    # normalize to a non-negative shift; result[i] = x[(i - shift) mod n]
    # int32: tpu.dynamic_rotate requires an i32 shift (x64 mode would trace
    # a bare Python int as i64 and fail MLIR verification)
    return pltpu.roll(x, jnp.int32(shift % x.shape[axis]), axis=axis)


def _shift_y(x0, xm, xp, shift, axis):
    """Shifted-along-y view of the current y-tile: result[.., i, ..] =
    x[.., i - shift, ..] with the out-of-tile rows stitched from the
    neighbor tiles (xm = tile jy-1, xp = tile jy+1)."""
    idx_lo = lambda a, k: tuple(
        slice(None) if d != axis else slice(None, k) for d in range(a.ndim))
    idx_hi = lambda a, k: tuple(
        slice(None) if d != axis else slice(-k, None) for d in range(a.ndim))
    if shift > 0:      # rows come from the -y side
        return jnp.concatenate(
            [xm[idx_hi(xm, shift)], x0[idx_lo(x0, x0.shape[axis] - shift)]], axis)
    if shift < 0:
        k = -shift
        return jnp.concatenate(
            [x0[idx_hi(x0, x0.shape[axis] - k)], xp[idx_lo(xp, k)]], axis)
    return x0


def _tile_y(nyp_rows: int, row_width: int, n_blocks: int, itemsize: int = 4,
            sub: int = _SUB) -> int:
    """Largest multiple-of-``sub`` y-tile height whose ~n_blocks working set
    (double-buffered) stays within a conservative VMEM budget.  ``sub`` is
    16 when any operand is 2-byte (bf16 sublane tiling), else 8."""
    budget = 6 * 1024 * 1024
    ty = budget // max(1, 2 * n_blocks * row_width * itemsize)
    ty = max(sub, (ty // sub) * sub)
    return min(ty, nyp_rows)


def _sub_of(*arrays) -> int:
    """Sublane granularity for a kernel: 16 if any operand is 2-byte."""
    return 16 if any(a.dtype.itemsize == 2 for a in arrays) else _SUB


# ---------------------------------------------------------------------------
# A-block kernel: y[c] = sum_7 ka_o * shift_o(A[c]) for c in 0..2
# ---------------------------------------------------------------------------

def _a_kernel(ka_ref, am_ref, ap_ref, aym_ref, ayp_ref, a0_ref, out_ref):
    a0 = a0_ref[:, 0]                 # (3, TY, NXp)
    y = ka_ref[0, 0][None] * a0
    y += ka_ref[1, 0][None] * _roll(a0, 1, 2)    # -x neighbor
    y += ka_ref[2, 0][None] * _roll(a0, -1, 2)   # +x neighbor
    y += ka_ref[3, 0][None] * _shift_y(a0, aym_ref[:, 0], ayp_ref[:, 0], 1, 1)
    y += ka_ref[4, 0][None] * _shift_y(a0, aym_ref[:, 0], ayp_ref[:, 0], -1, 1)
    y += ka_ref[5, 0][None] * am_ref[:, 0]       # -z
    y += ka_ref[6, 0][None] * ap_ref[:, 0]       # +z
    out_ref[:, 0] = y


def _a_kernel_1tile(ka_ref, am_ref, ap_ref, a0_ref, out_ref):
    """Single-y-tile fast path: y-shifts are in-VMEM rolls (wrapped rows are
    killed by zero boundary/padding coefficients), so A streams 3x per
    matvec instead of 5x."""
    a0 = a0_ref[:, 0]
    y = ka_ref[0, 0][None] * a0
    y += ka_ref[1, 0][None] * _roll(a0, 1, 2)
    y += ka_ref[2, 0][None] * _roll(a0, -1, 2)
    y += ka_ref[3, 0][None] * _roll(a0, 1, 1)
    y += ka_ref[4, 0][None] * _roll(a0, -1, 1)
    y += ka_ref[5, 0][None] * am_ref[:, 0]
    y += ka_ref[6, 0][None] * ap_ref[:, 0]
    out_ref[:, 0] = y


def _apply_a(ka_p: jax.Array, A_p: jax.Array) -> jax.Array:
    nz, NYp, NXp = A_p.shape[1:]
    sub = _sub_of(ka_p, A_p)
    # blocks per grid step: ka 7 + A 5x3 + out 3
    TY = _tile_y(NYp, NXp, 25, A_p.dtype.itemsize, sub)
    if NYp % TY:  # NYp is a multiple of sub, TY too; repad via smaller tile
        TY = next(t for t in range(TY, sub - 1, -sub) if NYp % t == 0)
    nyt = NYp // TY
    clamp = _clamp
    plane = lambda *lead: pl.BlockSpec(
        lead + (1, TY, NXp),
        _i32map(lambda z, j, _n=len(lead): (0,) * _n + (z, j, 0)),
        memory_space=pltpu.VMEM,
    )
    a_at = lambda fz, fj=lambda j: j: pl.BlockSpec(
        (3, 1, TY, NXp),
        _i32map(lambda z, j: (0, fz(z), clamp(fj(j), nyt), 0)),
        memory_space=pltpu.VMEM,
    )
    one_tile = nyt == 1
    return pl.pallas_call(
        _a_kernel_1tile if one_tile else _a_kernel,
        grid=(nz, nyt),
        in_specs=[
            plane(7),
            a_at(lambda z: jnp.maximum(z - 1, 0)),
            a_at(lambda z: jnp.minimum(z + 1, nz - 1)),
        ] + ([] if one_tile else [
            a_at(lambda z: z, lambda j: j - 1),
            a_at(lambda z: z, lambda j: j + 1),
        ]) + [a_at(lambda z: z)],
        out_specs=a_at(lambda z: z),
        out_shape=jax.ShapeDtypeStruct(A_p.shape, A_p.dtype),
        interpret=INTERPRET,
    )(*((ka_p,) + (A_p,) * (3 if one_tile else 5)))


# ---------------------------------------------------------------------------
# U-coupling kernel over the conductor box:
#   gout[c] = sum_5 gu[c,k] * shift_k_along_c(U)
#   uout    = sum_7 ku_o * shift_o(U) + sum_c sum_3 da[c,k] * shift_k_along_c(A[c])
# ---------------------------------------------------------------------------

def _u_kernel(gu_ref, ku_ref, da_ref,
              um2_ref, um1_ref, u0_ref, up1_ref, up2_ref,
              uym_ref, uyp_ref,
              abm_ref, ab0_ref, abp_ref,
              abym_ref, abyp_ref,
              gout_ref, uout_ref):
    u0 = u0_ref[0]                   # (TY, BX)
    uym, uyp = uym_ref[0], uyp_ref[0]
    shy = lambda s: _shift_y(u0, uym, uyp, s, 0)
    gx = (gu_ref[0, 2, 0] * u0
          + gu_ref[0, 1, 0] * _roll(u0, 1, 1) + gu_ref[0, 3, 0] * _roll(u0, -1, 1)
          + gu_ref[0, 0, 0] * _roll(u0, 2, 1) + gu_ref[0, 4, 0] * _roll(u0, -2, 1))
    gy = (gu_ref[1, 2, 0] * u0
          + gu_ref[1, 1, 0] * shy(1) + gu_ref[1, 3, 0] * shy(-1)
          + gu_ref[1, 0, 0] * shy(2) + gu_ref[1, 4, 0] * shy(-2))
    gz = (gu_ref[2, 2, 0] * u0
          + gu_ref[2, 1, 0] * um1_ref[0] + gu_ref[2, 3, 0] * up1_ref[0]
          + gu_ref[2, 0, 0] * um2_ref[0] + gu_ref[2, 4, 0] * up2_ref[0])
    gout_ref[0, 0] = gx
    gout_ref[1, 0] = gy
    gout_ref[2, 0] = gz

    yu = (ku_ref[0, 0] * u0
          + ku_ref[1, 0] * _roll(u0, 1, 1) + ku_ref[2, 0] * _roll(u0, -1, 1)
          + ku_ref[3, 0] * shy(1) + ku_ref[4, 0] * shy(-1)
          + ku_ref[5, 0] * um1_ref[0] + ku_ref[6, 0] * up1_ref[0])
    ax, ay, az = ab0_ref[0, 0], ab0_ref[1, 0], ab0_ref[2, 0]
    yu += (da_ref[0, 1, 0] * ax
           + da_ref[0, 0, 0] * _roll(ax, 1, 1) + da_ref[0, 2, 0] * _roll(ax, -1, 1))
    yu += (da_ref[1, 1, 0] * ay
           + da_ref[1, 0, 0] * _shift_y(ay, abym_ref[1, 0], abyp_ref[1, 0], 1, 0)
           + da_ref[1, 2, 0] * _shift_y(ay, abym_ref[1, 0], abyp_ref[1, 0], -1, 0))
    yu += da_ref[2, 1, 0] * az + da_ref[2, 0, 0] * abm_ref[2, 0] + da_ref[2, 2, 0] * abp_ref[2, 0]
    uout_ref[0] = yu


def _u_kernel_1tile(gu_ref, ku_ref, da_ref,
                    um2_ref, um1_ref, u0_ref, up1_ref, up2_ref,
                    abm_ref, ab0_ref, abp_ref,
                    gout_ref, uout_ref):
    """Single-y-tile fast path: y-shifts as in-VMEM rolls (see _a_kernel_1tile)."""
    u0 = u0_ref[0]
    shy = lambda s: _roll(u0, s, 0)
    gx = (gu_ref[0, 2, 0] * u0
          + gu_ref[0, 1, 0] * _roll(u0, 1, 1) + gu_ref[0, 3, 0] * _roll(u0, -1, 1)
          + gu_ref[0, 0, 0] * _roll(u0, 2, 1) + gu_ref[0, 4, 0] * _roll(u0, -2, 1))
    gy = (gu_ref[1, 2, 0] * u0
          + gu_ref[1, 1, 0] * shy(1) + gu_ref[1, 3, 0] * shy(-1)
          + gu_ref[1, 0, 0] * shy(2) + gu_ref[1, 4, 0] * shy(-2))
    gz = (gu_ref[2, 2, 0] * u0
          + gu_ref[2, 1, 0] * um1_ref[0] + gu_ref[2, 3, 0] * up1_ref[0]
          + gu_ref[2, 0, 0] * um2_ref[0] + gu_ref[2, 4, 0] * up2_ref[0])
    gout_ref[0, 0] = gx
    gout_ref[1, 0] = gy
    gout_ref[2, 0] = gz

    yu = (ku_ref[0, 0] * u0
          + ku_ref[1, 0] * _roll(u0, 1, 1) + ku_ref[2, 0] * _roll(u0, -1, 1)
          + ku_ref[3, 0] * shy(1) + ku_ref[4, 0] * shy(-1)
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
    sub = _sub_of(gu_p, Ub_p)
    # blocks per grid step: gu 15 + ku 7 + da 9 + u 7 + A 5x3 + out 4
    TY = _tile_y(BYp, BXp, 57, Ub_p.dtype.itemsize, sub)
    if BYp % TY:
        TY = next(t for t in range(TY, sub - 1, -sub) if BYp % t == 0)
    nyt = BYp // TY
    clampj = lambda v: _clamp(v, nyt)
    u_at = lambda fz, fj=lambda j: j: pl.BlockSpec(
        (1, TY, BXp), _i32map(lambda z, j: (fz(z), clampj(fj(j)), 0)),
        memory_space=pltpu.VMEM,
    )
    a_at = lambda fz, fj=lambda j: j: pl.BlockSpec(
        (3, 1, TY, BXp), _i32map(lambda z, j: (0, fz(z), clampj(fj(j)), 0)),
        memory_space=pltpu.VMEM,
    )
    lead = lambda *ld: pl.BlockSpec(
        ld + (1, TY, BXp),
        _i32map(lambda z, j, _n=len(ld): (0,) * _n + (z, j, 0)),
        memory_space=pltpu.VMEM,
    )
    lo = lambda d: (lambda z: jnp.maximum(z - d, 0))
    hi = lambda d: (lambda z: jnp.minimum(z + d, bz - 1))
    ident = lambda z: z
    one_tile = nyt == 1
    in_specs = [
        lead(3, 5), lead(7), lead(3, 3),
        u_at(lo(2)), u_at(lo(1)), u_at(ident), u_at(hi(1)), u_at(hi(2)),
    ] + ([] if one_tile else [
        u_at(ident, lambda j: j - 1), u_at(ident, lambda j: j + 1),
    ]) + [
        a_at(lo(1)), a_at(ident), a_at(hi(1)),
    ] + ([] if one_tile else [
        a_at(ident, lambda j: j - 1), a_at(ident, lambda j: j + 1),
    ])
    n_u, n_a = (5, 3) if one_tile else (7, 5)
    gout, uout = pl.pallas_call(
        _u_kernel_1tile if one_tile else _u_kernel,
        grid=(bz, nyt),
        in_specs=in_specs,
        out_specs=(a_at(ident), u_at(ident)),
        out_shape=(
            jax.ShapeDtypeStruct(Ab_p.shape, Ab_p.dtype),
            jax.ShapeDtypeStruct(Ub_p.shape, Ub_p.dtype),
        ),
        interpret=INTERPRET,
    )(gu_p, ku_p, da_p, *((Ub_p,) * n_u), *((Ab_p,) * n_a))
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
    dtype = op.ka.dtype
    # bf16 coefficient streams need sublane-16 tiling; the (f32) state
    # shares the padded layout, so it pads to 16 as well
    sub = 16 if jnp.dtype(dtype).itemsize == 2 else _SUB
    NYp, NXp = _pad_to(ny, sub), _pad_to(nx, _LANE)
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
    BYp, BXp = _pad_to(by, sub), _pad_to(bx, _LANE)
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
