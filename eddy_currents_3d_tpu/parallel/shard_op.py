"""Explicit multi-chip execution tier: `shard_map` + halo `ppermute` + per-shard
fused kernels.

The GSPMD tier (parallel/mesh.py) lets the XLA partitioner slice the
flat-roll matvec; correct, but the partitioner must materialize whole-array
rotations as halo traffic it cannot overlap, and the fused Pallas kernels
cannot run under it.  This module is the hand-scheduled tier the reference
has no analog of (it is single-threaded Fortran, SURVEY §2 "no parallelism
of any kind"): the voxel grid is decomposed into z-slabs over the ``"z"``
axis of a device mesh, each device holds its slab of every coefficient and
state field, and one matvec is

  1. ``ppermute`` the ±1 ghost A-planes and the ±2 ghost U-planes (box
     window only) to the z-neighbors over ICI — started first so XLA's
     async collectives overlap them with the bulk compute;
  2. the single-device fused kernels (Pallas on TPU, shifted-multiply-add
     jnp on CPU) on the local slab — the interior work, independent of the
     halos;
  3. cheap per-plane corrections folding the received ghost planes into the
     two boundary z-planes of the local result.

Step 3 exists because the Pallas kernels use *clamped* neighbor-plane index
maps (ops/pallas_stencil.py): at a true grid face the duplicated plane is
killed by a zero coefficient, but at an interior shard face the coefficient
is live, so the correction subtracts the clamped duplicate and adds the
ghost plane: ``y[0] += ka_-z[0] * (ghost - a[0])``.  The jnp backend uses
zero-fill shifts, so its corrections are pure adds.

Layout: fields live in the same lane/sublane-padded space as the
single-chip Pallas tier, with z additionally padded to a multiple of the
mesh's z extent (padded planes carry zero coefficients and so stay
identically zero through BiCGSTAB).  The U-coupling fields keep the
conductor-box (y, x) window but span the full (padded) z range, since a
per-shard z window would give ragged shard shapes; only gu/ku/da pay the
z-inflation and they are the minor coefficient streams.

Solver dots/axpys run *outside* the shard_map at the GSPMD level, where an
elementwise op on z-sharded operands partitions trivially and a reduction
lowers to one fused psum all-reduce (solvers/bicgstab.py needs no changes).

Reference semantics being distributed: the CSR SpMV of solvers.f90:54-61
over the [Ax|Ay|Az|U] operator of EC3D.f90:465-1049.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assembly.stencil import OFFSETS7, State, shift

__all__ = ["ShardedStencilOperator"]

_LANE = 128
_SUB = 8


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_zyx(arr: np.ndarray, NZp: int, NYp: int, NXp: int) -> np.ndarray:
    pad = [(0, 0)] * (arr.ndim - 3) + [
        (0, NZp - arr.shape[-3]), (0, NYp - arr.shape[-2]), (0, NXp - arr.shape[-1])
    ]
    return np.pad(arr, pad)


class ShardedStencilOperator:
    """z-slab-sharded stencil operator with explicit halo exchange.

    Construct with ``use_pallas=True`` on TPU meshes (per-shard fused
    kernels) or ``False`` for the jnp shifted-multiply-add backend (CPU
    meshes, f64 validation runs).
    """

    def __init__(self, system, mesh: Mesh, dtype=jnp.float32,
                 use_pallas: bool = False, interpret: bool = False,
                 coeff_dtype=None):
        if mesh.shape.get("y", 1) != 1:
            raise ValueError(
                "the explicit halo tier shards z-slabs only; use a mesh with "
                "n_y == 1 (y-column decomposition falls back to the GSPMD tier)")
        self.mesh = mesh
        self.n_z = int(mesh.shape["z"])
        self.dtype = dtype
        self.coeff_dtype = coeff_dtype or dtype
        self.use_pallas = use_pallas
        self.interpret = interpret

        op = system.op
        nz, ny, nx = op.shape_zyx
        self.shape_zyx = (nz, ny, nx)
        # mirror ops/pallas_stencil.from_assembled: 2-byte operands (bf16
        # coefficient streams) need sublane-16 tiling; the state shares the
        # padded layout so it pads to 16 as well
        sub = 16 if (jnp.dtype(self.coeff_dtype).itemsize == 2
                     or jnp.dtype(dtype).itemsize == 2) else _SUB
        self._sub = sub
        NYp, NXp = _pad_to(ny, sub), _pad_to(nx, _LANE)
        # each shard needs >= 2 local planes for the ±2 U halos to stay
        # nearest-neighbor
        NZp = self.n_z * max(2, -(-nz // self.n_z))
        self.padded_zyx = (NZp, NYp, NXp)

        gspec = lambda ndim: NamedSharding(
            mesh, P(*([None] * (ndim - 3) + ["z", None, None])))
        # coefficient streams in coeff_dtype (bf16 halves the dominant HBM
        # traffic); state stays in `dtype` (handled by pad_state/diagonal)
        put = lambda a: jax.device_put(
            jnp.asarray(a, self.coeff_dtype), gspec(a.ndim))

        self.ka_p = put(_pad_zyx(np.asarray(system.np_ka), NZp, NYp, NXp))

        if op.box is None:
            self.box = None
            self.gu_p = self.ku_p = self.da_p = None
        else:
            # (y, x) conductor-box window (halo already included by
            # assemble_operator), full padded z extent.  Shift the window
            # origin back when lane/sublane padding would overrun the grid —
            # the extra low-side cells carry zero coefficients.
            _, _, y0, y1, x0, x1 = op.box
            by, bx = y1 - y0, x1 - x0
            BYp, BXp = _pad_to(by, _SUB), _pad_to(bx, _LANE)
            y0n, x0n = min(y0, NYp - BYp), min(x0, NXp - BXp)
            ly, lx = y0 - y0n, x0 - x0n

            def window(full: np.ndarray) -> np.ndarray:
                win = full[..., :, y0:y1, x0:x1]
                pad = [(0, 0)] * (full.ndim - 3) + [
                    (0, NZp - nz), (ly, BYp - by - ly), (lx, BXp - bx - lx)]
                return np.pad(win, pad)

            self.box = (y0n, y0n + BYp, x0n, x0n + BXp)
            self.gu_p = put(window(np.asarray(system.np_gu)))
            self.ku_p = put(window(np.asarray(system.np_ku)))
            self.da_p = put(window(np.asarray(system.np_da)))

        spec_a = P(None, "z", None, None)
        spec_u = P("z", None, None)
        # check_vma=False: pallas_call inside shard_map would otherwise
        # require varying-mesh-axis annotations on every out_shape
        if self.box is None:
            self._apply_sm = jax.shard_map(
                self._local_apply_nobox, mesh=mesh,
                in_specs=(spec_a, spec_a), out_specs=(spec_a, spec_u),
                check_vma=False)
        else:
            self._apply_sm = jax.shard_map(
                self._local_apply, mesh=mesh,
                in_specs=(spec_a, P(None, None, "z", None, None), spec_a,
                          P(None, None, "z", None, None), spec_a, spec_u),
                out_specs=(spec_a, spec_u), check_vma=False)
            self._div_sm = jax.shard_map(
                self._local_div, mesh=mesh,
                in_specs=(P(None, None, "z", None, None), spec_a),
                out_specs=spec_u, check_vma=False)

    # -- state padding (same invariant as the single-chip Pallas tier:
    #    padded cells have zero coefficients, so they stay zero through
    #    BiCGSTAB and padding costs one pad/unpad per solve) --
    def pad_state(self, x: State) -> State:
        nz, ny, nx = self.shape_zyx
        NZp, NYp, NXp = self.padded_zyx
        pad = [(0, NZp - nz), (0, NYp - ny), (0, NXp - nx)]
        return State(jnp.pad(x.A, [(0, 0)] + pad), jnp.pad(x.U, pad))

    def unpad_state(self, x: State) -> State:
        nz, ny, nx = self.shape_zyx
        return State(x.A[:, :nz, :ny, :nx], x.U[:nz, :ny, :nx])

    # ------------------------------------------------------------------
    def apply(self, x: State) -> State:
        """y = A @ x on padded, z-sharded fields."""
        if self.box is None:
            yA, yU = self._apply_sm(self.ka_p, x.A)
        else:
            yA, yU = self._apply_sm(
                self.ka_p, self.gu_p, self.ku_p, self.da_p, x.A, x.U)
        return State(yA, yU)

    def apply_div(self, A: jax.Array) -> jax.Array:
        """U-row div(dA/dt) contraction on the *unpadded* grid A — the
        per-step RHS term (EC3D.f90:385-392)."""
        nz, ny, nx = self.shape_zyx
        if self.box is None:
            return jnp.zeros(A.shape[1:], A.dtype)
        NZp, NYp, NXp = self.padded_zyx
        A_p = jnp.pad(A, [(0, 0), (0, NZp - nz), (0, NYp - ny), (0, NXp - nx)])
        return self._div_sm(self.da_p, A_p)[:nz, :ny, :nx]

    # ------------------------------------------------------------------
    # per-shard bodies (called under shard_map; shapes are local slabs)
    # ------------------------------------------------------------------
    def _perms(self):
        up = [(i, i + 1) for i in range(self.n_z - 1)]    # recv from below
        dn = [(i + 1, i) for i in range(self.n_z - 1)]    # recv from above
        return up, dn

    def _halo_a(self, A):
        """±1 ghost planes of A; zeros at the outer slabs (their face rows
        carry zero outward coefficients anyway)."""
        up, dn = self._perms()
        a_lo = jax.lax.ppermute(A[:, -1], "z", up)
        a_hi = jax.lax.ppermute(A[:, 0], "z", dn)
        return a_lo, a_hi

    def _local_apply_nobox(self, ka, A):
        a_lo, a_hi = self._halo_a(A)
        yA = self._a_block(ka, A, a_lo, a_hi)
        return yA, jnp.zeros(A.shape[1:], A.dtype)

    def _local_apply(self, ka, gu, ku, da, A, U):
        y0, y1, x0, x1 = self.box
        up, dn = self._perms()
        # halos first: XLA's async collective-permute overlaps them with the
        # halo-independent bulk kernels below
        a_lo, a_hi = self._halo_a(A)
        u_lo = jax.lax.ppermute(U[-2:, y0:y1, x0:x1], "z", up)  # [z-2, z-1]
        u_hi = jax.lax.ppermute(U[:2, y0:y1, x0:x1], "z", dn)   # [z+1, z+2]

        yA = self._a_block(ka, A, a_lo, a_hi)

        Ub = U[:, y0:y1, x0:x1]
        Ab = A[:, :, y0:y1, x0:x1]
        ab_lo = a_lo[:, y0:y1, x0:x1]
        ab_hi = a_hi[:, y0:y1, x0:x1]

        if self.use_pallas:
            from ..ops import pallas_stencil as ps
            prev = ps.INTERPRET
            ps.INTERPRET = self.interpret or prev
            try:
                gout, uout = ps._apply_u(gu, ku, da, Ub, Ab)
            finally:
                ps.INTERPRET = prev
            # clamped-plane corrections (see module docstring)
            gout = gout.at[2, 0].add(gu[2, 1, 0] * (u_lo[1] - Ub[0])
                                     + gu[2, 0, 0] * (u_lo[0] - Ub[0]))
            gout = gout.at[2, 1].add(gu[2, 0, 1] * (u_lo[1] - Ub[0]))
            gout = gout.at[2, -1].add(gu[2, 3, -1] * (u_hi[0] - Ub[-1])
                                      + gu[2, 4, -1] * (u_hi[1] - Ub[-1]))
            gout = gout.at[2, -2].add(gu[2, 4, -2] * (u_hi[0] - Ub[-1]))
            uout = uout.at[0].add(ku[5, 0] * (u_lo[1] - Ub[0])
                                  + da[2, 0, 0] * (ab_lo[2] - Ab[2, 0]))
            uout = uout.at[-1].add(ku[6, -1] * (u_hi[0] - Ub[-1])
                                   + da[2, 2, -1] * (ab_hi[2] - Ab[2, -1]))
        else:
            # jnp backend: zero-fill shifts, ghost contributions are adds
            gt = []
            for c in range(3):
                t = gu[c, 2] * Ub
                for k, d in ((0, -2), (1, -1), (3, +1), (4, +2)):
                    t = t + gu[c, k] * shift(Ub, c, d)
                gt.append(t)
            gz = gt[2]
            gz = gz.at[0].add(gu[2, 1, 0] * u_lo[1] + gu[2, 0, 0] * u_lo[0])
            gz = gz.at[1].add(gu[2, 0, 1] * u_lo[1])
            gz = gz.at[-1].add(gu[2, 3, -1] * u_hi[0] + gu[2, 4, -1] * u_hi[1])
            gz = gz.at[-2].add(gu[2, 4, -2] * u_hi[0])
            gt[2] = gz
            gout = jnp.stack(gt)

            uout = ku[0] * Ub
            for o, (axis, d) in enumerate(OFFSETS7):
                if o:
                    uout = uout + ku[o] * shift(Ub, axis, d)
            for c in range(3):
                uout = (uout + da[c, 1] * Ab[c]
                        + da[c, 0] * shift(Ab[c], c, -1)
                        + da[c, 2] * shift(Ab[c], c, +1))
            uout = uout.at[0].add(ku[5, 0] * u_lo[1] + da[2, 0, 0] * ab_lo[2])
            uout = uout.at[-1].add(ku[6, -1] * u_hi[0] + da[2, 2, -1] * ab_hi[2])

        yA = yA.at[:, :, y0:y1, x0:x1].add(gout)
        yU = jnp.zeros(U.shape, U.dtype).at[:, y0:y1, x0:x1].set(uout)
        return yA, yU

    def _a_block(self, ka, A, a_lo, a_hi):
        """Shared 7-point A stencil on the local slab + ghost-plane terms."""
        if self.use_pallas:
            from ..ops import pallas_stencil as ps
            prev = ps.INTERPRET
            ps.INTERPRET = self.interpret or prev
            try:
                yA = ps._apply_a(ka, A)
            finally:
                ps.INTERPRET = prev
            yA = yA.at[:, 0].add(ka[5, 0] * (a_lo - A[:, 0]))
            yA = yA.at[:, -1].add(ka[6, -1] * (a_hi - A[:, -1]))
        else:
            yA = ka[0] * A
            for o, (axis, d) in enumerate(OFFSETS7):
                if o:
                    yA = yA + ka[o] * shift(A, axis, d)
            yA = yA.at[:, 0].add(ka[5, 0] * a_lo)
            yA = yA.at[:, -1].add(ka[6, -1] * a_hi)
        return yA

    def _local_div(self, da, A):
        y0, y1, x0, x1 = self.box
        up, dn = self._perms()
        az_lo = jax.lax.ppermute(A[2, -1, y0:y1, x0:x1], "z", up)
        az_hi = jax.lax.ppermute(A[2, 0, y0:y1, x0:x1], "z", dn)
        Ab = A[:, :, y0:y1, x0:x1]
        yUb = jnp.zeros(Ab.shape[1:], A.dtype)
        for c in range(3):
            yUb = (yUb + da[c, 1] * Ab[c]
                   + da[c, 0] * shift(Ab[c], c, -1)
                   + da[c, 2] * shift(Ab[c], c, +1))
        yUb = yUb.at[0].add(da[2, 0, 0] * az_lo)
        yUb = yUb.at[-1].add(da[2, 2, -1] * az_hi)
        return jnp.zeros(A.shape[1:], A.dtype).at[:, y0:y1, x0:x1].set(yUb)

    # ------------------------------------------------------------------
    def diagonal_padded(self) -> State:
        """Operator diagonal in padded space (1 on padded / non-U cells) —
        for right-Jacobi under the shard tier."""
        NZp, NYp, NXp = self.padded_zyx
        ka0 = self.ka_p[0].astype(self.dtype)   # state dtype, not coeff dtype
        dA = jnp.broadcast_to(ka0[None], (3, NZp, NYp, NXp))
        dA = jnp.where(dA == 0, jnp.ones((), self.dtype), dA)
        dU = jnp.ones((NZp, NYp, NXp), self.dtype)
        if self.box is not None:
            y0, y1, x0, x1 = self.box
            ku0 = self.ku_p[0].astype(self.dtype)
            dU = dU.at[:, y0:y1, x0:x1].set(
                jnp.where(ku0 == 0, jnp.ones((), self.dtype), ku0))
        return State(dA, dU)
