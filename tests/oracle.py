"""Independent reference implementation ("oracle") used only by tests.

Implements the reference semantics (EC3D.f90 / solvers.f90) the way the
Fortran does: per-cell loops, explicit U-row case ladder, CSR matrix,
numpy BiCGSTAB — deliberately a *different structure* from the vectorized
mask-algebra assembler in the package, so agreement is meaningful.

Indexing follows the Fortran convention: 1-based (i,j,k), cell number
nn = i + sdx*(j-1) + sdx*sdy*(k-1); unknowns [Ax | Ay | Az | U].
"""

from __future__ import annotations

import numpy as np


class OracleSystem:
    def __init__(self, model):
        self.model = model
        sdx, sdy, sdz = model.shape_xyz
        self.sdx, self.sdy, self.sdz = sdx, sdy, sdz
        self.N = sdx * sdy * sdz
        # geo in Fortran layout
        self.geo = np.zeros((sdx + 4, sdy + 4, sdz + 4), np.int64)
        self.geo[2:-2, 2:-2, 2:-2] = np.moveaxis(model.geo, (0, 1, 2), (2, 1, 0))
        # conducting local number -> global col (3N + m), 0 elsewhere
        self.gc = np.zeros_like(self.geo)
        cn = np.moveaxis(model.cond_number, (0, 1, 2), (2, 1, 0))
        self.gc[2:-2, 2:-2, 2:-2] = np.where(cn > 0, 3 * self.N + cn, 0)
        dom = {d.ident: d for d in model.domains}
        self.D = {i: d.D for i, d in dom.items()}
        self.C = {i: d.C for i, d in dom.items()}
        self.Ve = {i: d.Ve for i, d in dom.items()}
        self.cond_ids = {d.ident for d in model.domains if d.conducting}

    def g(self, i, j, k):
        return int(self.geo[i + 1, j + 1, k + 1])

    def fc(self, i, j, k):
        """geoPHYS_C equivalent (global U column or 0)."""
        return int(self.gc[i + 1, j + 1, k + 1])

    def cell(self, i, j, k):
        return i + self.sdx * (j - 1) + self.sdx * self.sdy * (k - 1)

    def build(self):
        """Returns (dense rows dict: row -> {col: val}, bndX/Y/Z, bndUx/y/z)."""
        m = self.model
        sdx, sdy, sdz, N = self.sdx, self.sdy, self.sdz, self.N
        dx, dy, dz = [float(v) for v in m.delta]
        sx, sy, sz = 1 / dx**2, 1 / dy**2, 1 / dz**2
        dsx, dsy, dsz = 0.5 / dx, 0.5 / dy, 0.5 / dz
        dt = float(m.tran.step)
        BND = np.asarray(m.solver.BND, float)
        rows: dict[int, dict[int, float]] = {}
        bndX, bndY, bndZ = [], [], []
        bndUx, bndUy, bndUz = [], [], []

        def put(row, cols, vals):
            d = rows.setdefault(row, {})
            for c, v in zip(cols, vals):
                assert c > 0, f"row {row}: column {c} <= 0 (reference STOP)"
                assert c not in d, f"row {row}: duplicate column {c}"
                d[c] = v

        for k in range(1, sdz + 1):
            for j in range(1, sdy + 1):
                for i in range(1, sdx + 1):
                    nn = self.cell(i, j, k)
                    dom = self.g(i, j, k)
                    conducting = dom in self.cond_ids
                    kim, kip = nn - 1, nn + 1
                    kjm, kjp = nn - sdx, nn + sdx
                    kkm, kkp = nn - sdx * sdy, nn + sdx * sdy

                    on_b = i in (1, sdx) or j in (1, sdy) or k in (1, sdz)
                    colX, valX = [], []
                    if on_b:
                        # boundary A-row, per-axis composition of the
                        # corner/edge/face ladder (EC3D.f90:528-643)
                        diag = 0.0
                        for (lo, hi, km_, kp_, s_, a) in (
                            (i, sdx, kim, kip, sx, 0),
                            (j, sdy, kjm, kjp, sy, 1),
                            (k, sdz, kkm, kkp, sz, 2),
                        ):
                            if lo == 1:
                                colX.append(kp_); valX.append(BND[a, 1] * s_)
                                diag += s_
                            elif lo == hi:
                                colX.append(km_); valX.append(BND[a, 0] * s_)
                                diag += s_
                            else:
                                colX += [km_, kp_]; valX += [-s_, -s_]
                                diag += 2 * s_
                        colX.append(nn); valX.append(diag)
                        colY = [c + N for c in colX]; valY = list(valX)
                        colZ = [c + 2 * N for c in colX]; valZ = list(valX)
                    else:
                        colX = [kim, kip, kjm, kjp, kkm, kkp, nn]
                        valX = [-sx, -sx, -sy, -sy, -sz, -sz, 2 * (sx + sy + sz)]
                        if conducting:
                            C = self.C[dom]
                            vex, vey, vez = self.Ve[dom]
                            valX[0] -= vex / (2 * dx); valX[1] += vex / (2 * dx)
                            valX[2] -= vey / (2 * dy); valX[3] += vey / (2 * dy)
                            valX[4] -= vez / (2 * dz); valX[5] += vez / (2 * dz)
                            valX[6] += 2 * C / dt
                        colY = [c + N for c in colX]; valY = list(valX)
                        colZ = [c + 2 * N for c in colX]; valZ = list(valX)
                        if conducting:
                            C = self.C[dom]
                            # grad-U coupling (EC3D.f90:667-710)
                            for (ax, ds_, cols_, bnd) in (
                                (0, dsx, colX, bndX), (1, dsy, colY, bndY), (2, dsz, colZ, bndZ)
                            ):
                                vals_ = (valX, valY, valZ)[ax]
                                off = lambda d: {
                                    0: (i + d, j, k), 1: (i, j + d, k), 2: (i, j, k + d)
                                }[ax]
                                if self.fc(*off(+1)) == 0:
                                    cols_ += [self.fc(i, j, k), self.fc(*off(-1)), self.fc(*off(-2))]
                                    vals_ += [-3 * C * ds_, 4 * C * ds_, -1 * C * ds_]
                                    bnd.append(nn + ax * N)
                                elif self.fc(*off(-1)) == 0:
                                    cols_ += [self.fc(i, j, k), self.fc(*off(+1)), self.fc(*off(+2))]
                                    vals_ += [3 * C * ds_, -4 * C * ds_, 1 * C * ds_]
                                    bnd.append(nn + ax * N)
                                else:
                                    cols_ += [self.fc(*off(+1)), self.fc(*off(-1))]
                                    vals_ += [-C * ds_, C * ds_]
                    put(nn, colX, valX)
                    put(N + nn, colY, valY)
                    put(2 * N + nn, colZ, valZ)

                    # ---- U row (EC3D.f90:766-922) ----
                    if not conducting:
                        continue
                    nc = self.fc(i, j, k)
                    nim, nip = self.fc(i - 1, j, k), self.fc(i + 1, j, k)
                    njm, njp = self.fc(i, j - 1, k), self.fc(i, j + 1, k)
                    nkm, nkp = self.fc(i, j, k - 1), self.fc(i, j, k + 1)
                    S = 2 * (sx + sy + sz)
                    ax_ = 2.0 / (dt * dx); ay_ = 2.0 / (dt * dy); az_ = 2.0 / (dt * dz)
                    fx, fy, fz = 0, 0, 0
                    # literal ladder transcription, in reference order
                    if nim == 0 and njm == 0 and nkm == 0:
                        cols = [nip, njp, nkp, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, -ax_, -ay_, -az_]
                        fx = fy = fz = 1
                    elif nip == 0 and njm == 0 and nkm == 0:
                        cols = [nim, njp, nkp, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, +ax_, -ay_, -az_]
                        fx = fy = fz = 1
                    elif nim == 0 and njp == 0 and nkm == 0:
                        cols = [nip, njm, nkp, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, -ax_, +ay_, -az_]
                        fx = fy = fz = 1
                    elif nip == 0 and njp == 0 and nkm == 0:
                        cols = [nim, njm, nkp, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, +ax_, +ay_, -az_]
                        fx = fy = fz = 1
                    elif nim == 0 and njm == 0 and nkp == 0:
                        cols = [nip, njp, nkm, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, -ax_, -ay_, +az_]
                        fx = fy = fz = 1
                    elif nip == 0 and njm == 0 and nkp == 0:
                        cols = [nim, njp, nkm, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, +ax_, -ay_, +az_]
                        fx = fy = fz = 1
                    elif nim == 0 and njp == 0 and nkp == 0:
                        # reference sign quirk (EC3D.f90:803-806)
                        cols = [nip, njm, nkm, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, +ax_, -ay_, +az_]
                        fx = fy = fz = 1
                    elif nip == 0 and njp == 0 and nkp == 0:
                        cols = [nim, njm, nkm, nc, nn, N + nn, 2 * N + nn]
                        vals = [-2 * sx, -2 * sy, -2 * sz, S, +ax_, +ay_, +az_]
                        fx = fy = fz = 1
                    elif njp == 0 and nkm == 0:
                        cols = [nip, nim, njm, nkp, nc, N + nn, 2 * N + nn]
                        vals = [-sx, -sx, -2 * sy, -2 * sz, S, +ay_, -az_]
                        fy = fz = 1
                    elif njm == 0 and nkm == 0:
                        cols = [nip, nim, njp, nkp, nc, N + nn, 2 * N + nn]
                        vals = [-sx, -sx, -2 * sy, -2 * sz, S, -ay_, -az_]
                        fy = fz = 1
                    elif njp == 0 and nkp == 0:
                        cols = [nip, nim, njm, nkm, nc, N + nn, 2 * N + nn]
                        vals = [-sx, -sx, -2 * sy, -2 * sz, S, +ay_, +az_]
                        fy = fz = 1
                    elif njm == 0 and nkp == 0:
                        cols = [nip, nim, njp, nkm, nc, N + nn, 2 * N + nn]
                        vals = [-sx, -sx, -2 * sy, -2 * sz, S, -ay_, +az_]
                        fy = fz = 1
                    elif nip == 0 and nkm == 0:
                        cols = [nim, njm, njp, nkp, nc, nn, 2 * N + nn]
                        vals = [-2 * sx, -sy, -sy, -2 * sz, S, +ax_, -az_]
                        fx = fz = 1
                    elif nim == 0 and nkm == 0:
                        cols = [nip, njm, njp, nkp, nc, nn, 2 * N + nn]
                        vals = [-2 * sx, -sy, -sy, -2 * sz, S, -ax_, -az_]
                        fx = fz = 1
                    elif nip == 0 and nkp == 0:
                        cols = [nim, njm, njp, nkm, nc, nn, 2 * N + nn]
                        vals = [-2 * sx, -sy, -sy, -2 * sz, S, +ax_, +az_]
                        fx = fz = 1
                    elif nim == 0 and nkp == 0:
                        cols = [nip, njm, njp, nkm, nc, nn, 2 * N + nn]
                        vals = [-2 * sx, -sy, -sy, -2 * sz, S, -ax_, +az_]
                        fx = fz = 1
                    elif nim == 0 and njm == 0:
                        cols = [nip, njp, nkp, nkm, nc, nn, N + nn]
                        vals = [-2 * sx, -2 * sy, -sz, -sz, S, -ax_, -ay_]
                        fx = fy = 1
                    elif nip == 0 and njm == 0:
                        cols = [nim, njp, nkp, nkm, nc, nn, N + nn]
                        vals = [-2 * sx, -2 * sy, -sz, -sz, S, +ax_, -ay_]
                        fx = fy = 1
                    elif nim == 0 and njp == 0:
                        cols = [nip, njm, nkp, nkm, nc, nn, N + nn]
                        vals = [-2 * sx, -2 * sy, -sz, -sz, S, -ax_, +ay_]
                        fx = fy = 1
                    elif nip == 0 and njp == 0:
                        cols = [nim, njm, nkm, nkp, nc, nn, N + nn]
                        vals = [-2 * sx, -2 * sy, -sz, -sz, S, +ax_, +ay_]
                        fx = fy = 1
                    elif nim == 0 and njp != 0 and njm != 0 and nkp != 0 and nkm != 0:
                        cols = [nip, njm, njp, nkm, nkp, nc, nn]
                        vals = [-2 * sx, -sy, -sy, -sz, -sz, S, -ax_]
                        fx = 1
                    elif nip == 0 and njp != 0 and njm != 0 and nkp != 0 and nkm != 0:
                        cols = [nim, njm, njp, nkm, nkp, nc, nn]
                        vals = [-2 * sx, -sy, -sy, -sz, -sz, S, +ax_]
                        fx = 1
                    elif njp == 0 and nip != 0 and nim != 0 and nkp != 0 and nkm != 0:
                        cols = [nim, nip, njm, nkm, nkp, nc, N + nn]
                        vals = [-sx, -sx, -2 * sy, -sz, -sz, S, +ay_]
                        fy = 1
                    elif njm == 0 and nip != 0 and nim != 0 and nkp != 0 and nkm != 0:
                        cols = [nim, nip, njp, nkm, nkp, nc, N + nn]
                        vals = [-sx, -sx, -2 * sy, -sz, -sz, S, -ay_]
                        fy = 1
                    elif nkp == 0 and nip != 0 and nim != 0 and njp != 0 and njm != 0:
                        cols = [nim, nip, njm, njp, nkm, nc, 2 * N + nn]
                        vals = [-sx, -sx, -sy, -sy, -2 * sz, S, +az_]
                        fz = 1
                    elif nkm == 0 and nip != 0 and nim != 0 and njp != 0 and njm != 0:
                        cols = [nim, nip, njm, njp, nkp, nc, 2 * N + nn]
                        vals = [-sx, -sx, -sy, -sy, -2 * sz, S, -az_]
                        fz = 1
                    else:
                        cols = [nim, nip, njm, njp, nkm, nkp, nc,
                                kip, kim, N + kjp, N + kjm, 2 * N + kkp, 2 * N + kkm]
                        vals = [-sx, -sx, -sy, -sy, -sz, -sz, S,
                                -0.5 / (dt * dx), 0.5 / (dt * dx),
                                -0.5 / (dt * dy), 0.5 / (dt * dy),
                                -0.5 / (dt * dz), 0.5 / (dt * dz)]
                    if fx: bndUx.append(nc)
                    if fy: bndUy.append(nc)
                    if fz: bndUz.append(nc)
                    put(nc, cols, vals)

        return rows, (bndX, bndY, bndZ), (bndUx, bndUy, bndUz)

    def to_scipy(self):
        from scipy import sparse
        rows, bnd_a, bnd_u = self.build()
        n = 3 * self.N + self.model.n_cond
        r, c, v = [], [], []
        for row, d in rows.items():
            for col, val in d.items():
                r.append(row - 1); c.append(col - 1); v.append(val)
        return sparse.coo_matrix((v, (r, c)), shape=(n, n)).tocsr(), bnd_a, bnd_u


def bicgstab_wr_numpy(A, b, x, tol, itmax):
    """Literal numpy transcription of solvers.f90:3-63 (in-place warm start)."""
    x = x.copy()
    r = b - A @ x
    r0 = r.copy()
    p = r.copy()
    bnorm = np.linalg.norm(b)
    it = 0
    if bnorm == 0.0:
        return x, it
    while True:
        if it > itmax:
            break
        it += 1
        ap = A @ p
        rr0 = r @ r0
        alpha = rr0 / (ap @ r0)
        s = r - alpha * ap
        if np.linalg.norm(s) / bnorm < tol:
            x = x + alpha * p
            break
        as_ = A @ s
        omega = (as_ @ s) / (as_ @ as_)
        x = x + alpha * p + omega * s
        r = s - omega * as_
        if np.linalg.norm(r) / bnorm < tol:
            break
        rr0n = r @ r0
        beta = (alpha / omega) * rr0n / rr0
        p = r + beta * (p - omega * ap)
        if abs(rr0n) / bnorm < tol:
            r0 = r.copy()
            p = r.copy()
    return x, it


class OracleSimulator:
    """Literal numpy transcription of the EC3D time loop (EC3D.f90:241-455),
    CSR matrix + dense vectors, static and moving sources."""

    def __init__(self, model):
        self.model = model
        self.sys = OracleSystem(model)
        self.A, bnd_a, bnd_u = self.sys.to_scipy()
        self.bnd_a = [np.array(b, int) - 1 for b in bnd_a]
        self.bnd_u = [np.array(b, int) - 1 for b in bnd_u]
        N = self.sys.N
        self.N = N
        self.n = 3 * N + model.n_cond
        self.cond_cells = np.nonzero(model.cond_mask.ravel())[0]
        self.inert_cells = model.domain_field("C").ravel() * 2.0 / model.tran.step
        self.flag_move = any(any(f.move) for f in model.functions)

    def run(self, num_steps, on_step=None):
        """Run the transcription loop; ``on_step(step_idx, Uaf, Jaf, it)``
        (1-based index, state *after* the step) lets callers snapshot
        intermediate states, e.g. the production-golden generator."""
        m = self.model
        N = self.N
        dt = float(m.tran.step)
        Uaf = np.zeros(self.n)
        Jaf = np.zeros(self.n)
        movestop = np.ones(3, int)
        dist = np.zeros((len(m.functions), 3))
        T = 0.0
        iters = []
        cond = self.cond_cells
        for _ in range(num_steps):
            vals = [float(fn(T)) for fn in m.functions]
            vm = [float(v(T)) for v in m.vmech]
            if self.flag_move:
                buf = np.zeros(self.n)
                for L in cond:
                    for c in range(3):
                        buf[c * N + L] = Jaf[c * N + L]
                Jaf = buf
                for fi, fn in enumerate(m.functions):
                    # motion_calc
                    for a in range(3):
                        vi = fn.vmech_index[a]
                        if vi == 0:
                            sh = (fn.vmech_const[a] * dt / m.delta[a]) if fn.move[a] else 0.0
                            dist[fi, a] += movestop[0] * sh
                        else:
                            dist[fi, a] += vm[vi - 1] * dt / m.delta[a]
                    length = np.trunc(dist[fi] + np.where(dist[fi] >= 0, 0.5, -0.5)).astype(int)
                    comp = {"X": 0, "Y": 1, "Z": 2}[fn.direction]
                    sdx, sdy, sdz = m.shape_xyz
                    for cell in fn.cells:
                        i = cell % sdx; j = (cell // sdx) % sdy; k = cell // (sdx * sdy)
                        new = [i + length[0], j + length[1], k + length[2]]
                        for a, sd in enumerate((sdx, sdy, sdz)):
                            if new[a] > sd - 3:
                                movestop[a] = 0; new[a] = sd - 3
                            elif new[a] < 1:
                                movestop[a] = 0; new[a] = 1
                            elif movestop[a] == 0 and (new[a] < sd - 3 or new[a] > 1):
                                movestop[a] = 1
                        flat = new[0] + sdx * new[1] + sdx * sdy * new[2]
                        Jaf[comp * N + flat] = vals[fi]
            else:
                for fi, fn in enumerate(m.functions):
                    comp = {"X": 0, "Y": 1, "Z": 2}[fn.direction]
                    Jaf[comp * N + fn.cells] = vals[fi]
            # inertial sources
            if len(cond):
                for c in range(3):
                    Jaf[c * N + cond] += self.inert_cells[cond] * Uaf[c * N + cond]
                # U-row RHS: A-coupling columns times old solution
                indptr, indices, data = self.A.indptr, self.A.indices, self.A.data
                cn = self.model.cond_number.ravel()
                for L in cond:
                    row = 3 * N + cn[L] - 1
                    ssum = 0.0
                    for kk in range(indptr[row], indptr[row + 1]):
                        if indices[kk] < 3 * N:
                            ssum += data[kk] * Uaf[indices[kk]]
                    Jaf[row] = ssum
                for b in self.bnd_u:
                    Jaf[b] = 0.0
                for b in self.bnd_a:
                    Jaf[b] = 0.0
            Uaf, it = bicgstab_wr_numpy(self.A, Jaf, Uaf, m.solver.tolerance, m.solver.itmax)
            iters.append(it)
            if len(cond):
                for c in range(3):
                    Jaf[c * N + cond] = self.inert_cells[cond] * Uaf[c * N + cond] - Jaf[c * N + cond]
                for b in self.bnd_a:
                    Jaf[b] = 0.0
                    Uaf[b] = 0.0
            T += dt
            if on_step is not None:
                on_step(len(iters), Uaf, Jaf, it)
        return Uaf, Jaf, iters
