"""ILU(0) preconditioning — incomplete LU with zero fill on the CSR pattern.

The reference solver is unpreconditioned (solvers.f90:3-63); this is the
incomplete-factorization tier of the TPU build (BASELINE "Jacobi/block-ILU0").

TPU-native split of the work:

* **Factorization** is inherently sequential row elimination, so it runs on
  host **once per assembly** — in the native C++ engine
  (native/ecsparse.cpp, ~100x the pure-numpy fallback) — never inside the
  timestep loop.
* **Application** ``z = U^-1 L^-1 v`` is what runs every Krylov iteration.
  Exact sequential triangular solves are the single worst pattern for a
  vector machine, so on device the triangular solves are applied as a
  *fixed number of Jacobi sweeps* (truncated Neumann series):

      L = I + Ls:        y_{k+1} = v - Ls y_k          (y_0 = v)
      U = D  + Us:       x_{k+1} = D^-1 (y - Us x_k)   (x_0 = D^-1 y)

  Each sweep is one ELL SpMV + axpy — dense streaming work.  With a fixed
  sweep count and fixed start the map v -> z is *linear and constant*, so it
  is a legitimate stationary preconditioner for BiCGSTAB (no flexible-Krylov
  machinery needed).  K sweeps reproduce the exact triangular solve whenever
  the factor's level-scheduling depth is <= K+1, and truncate it otherwise.

Right preconditioning keeps the residual history and convergence test those
of the original system: solve ``(A M^-1) y = b`` with ``x = M^-1 y`` and
warm start ``y_0 = M x_0 = L (U x_0)`` (both factors are retained for this).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import CSRMatrix, ELLMatrix
from ..ops.native import ilu0_native, ilu0_solve_native
from .bicgstab import bicgstab_wr, SolveResult

__all__ = ["ilu0_factorize", "ILU0Preconditioner", "bicgstab_ilu0"]


def _ilu0_numpy(indptr: np.ndarray, cols: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Pure-numpy/python ILU(0) — fallback when the native engine is
    unavailable.  Same in-place algorithm as native/ecsparse.cpp."""
    n = indptr.shape[0] - 1
    vals = vals.astype(np.float64, copy=True)
    diag = np.full(n, -1, np.int64)
    pos = np.full(n, -1, np.int64)
    for i in range(n):
        lo, hi = indptr[i], indptr[i + 1]
        rc = cols[lo:hi]
        if rc.size > 1 and np.any(np.diff(rc) <= 0):
            raise ValueError(f"ILU(0): unsorted columns in row {i}")
        pos[rc] = np.arange(lo, hi)
        for t in range(lo, hi):
            k = cols[t]
            if k >= i:
                break
            dk = diag[k]
            if dk < 0 or vals[dk] == 0.0:
                raise ZeroDivisionError(f"ILU(0): zero pivot in row {k}")
            lik = vals[t] / vals[dk]
            vals[t] = lik
            us = slice(dk + 1, indptr[k + 1])
            p = pos[cols[us]]
            hit = p >= 0
            vals[p[hit]] -= lik * vals[us][hit]
        d = np.nonzero(rc == i)[0]
        pos[rc] = -1
        if d.size == 0 or vals[lo + d[0]] == 0.0:
            raise ZeroDivisionError(f"ILU(0): zero or missing pivot in row {i}")
        diag[i] = lo + d[0]
    return vals


def _split_ell(indptr, cols, fvals, dtype):
    """Packed ILU(0) factors -> (strict-lower ELL, strict-upper ELL, diag)."""
    n = indptr.shape[0] - 1
    row = np.repeat(np.arange(n), np.diff(indptr))
    lower = cols < row
    upper = cols > row
    dmask = cols == row
    diag = np.zeros(n, np.float64)
    diag[row[dmask]] = fvals[dmask]

    def ell_of(mask):
        r, c, v = row[mask], cols[mask], fvals[mask]
        cnt = np.bincount(r, minlength=n)
        w = max(int(cnt.max()) if n else 0, 1)
        ec = np.zeros((n, w), np.int32)
        ev = np.zeros((n, w), np.float64)
        slot = np.arange(mask.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        ec[r, slot] = c
        ev[r, slot] = v
        return ELLMatrix(cols=jnp.asarray(ec), vals=jnp.asarray(ev, dtype),
                         shape=(n, n))

    return ell_of(lower), ell_of(upper), jnp.asarray(diag, dtype)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ILU0Preconditioner:
    """Device-resident ILU(0) factors with fixed-sweep application."""

    L: ELLMatrix            # strict lower of L (unit diagonal implied)
    U: ELLMatrix            # strict upper of U
    d: jax.Array            # diagonal of U
    inv_d: jax.Array

    def apply(self, v: jax.Array, sweeps: int = 4) -> jax.Array:
        """z ~= U^-1 L^-1 v via `sweeps` Jacobi sweeps per triangle."""
        y = v
        for _ in range(sweeps):
            y = v - self.L.matvec(y)
        x = self.inv_d * y
        for _ in range(sweeps):
            x = self.inv_d * (y - self.U.matvec(x))
        return x

    def matvec(self, x: jax.Array) -> jax.Array:
        """M x = L (U x) — used to warm-start right preconditioning."""
        ux = self.U.matvec(x) + self.d * x
        return ux + self.L.matvec(ux)


def ilu0_factorize(a: CSRMatrix, dtype=None) -> ILU0Preconditioner:
    """Host factorization (native C++ when available) -> device factors."""
    indptr = np.asarray(a.indptr, np.int64)
    cols = np.asarray(a.cols, np.int32)
    vals = np.asarray(a.vals, np.float64)
    fvals = ilu0_native(indptr, cols, vals)
    if fvals is None:
        fvals = _ilu0_numpy(indptr, cols, vals)
    dtype = dtype or a.vals.dtype
    L, U, d = _split_ell(indptr, cols, fvals, dtype)
    return ILU0Preconditioner(L=L, U=U, d=d, inv_d=1.0 / d)


def ilu0_solve_exact(a: CSRMatrix, b: np.ndarray) -> np.ndarray:
    """Exact host-side M^-1 b on the packed factors (validation path)."""
    indptr = np.asarray(a.indptr, np.int64)
    cols = np.asarray(a.cols, np.int32)
    vals = np.asarray(a.vals, np.float64)
    fvals = ilu0_native(indptr, cols, vals)
    if fvals is None:
        fvals = _ilu0_numpy(indptr, cols, vals)
    x = ilu0_solve_native(indptr, cols, fvals, np.asarray(b, np.float64))
    if x is not None:
        return x
    # numpy fallback: sequential substitution
    n = indptr.shape[0] - 1
    x = np.asarray(b, np.float64).copy()
    for i in range(n):
        for t in range(indptr[i], indptr[i + 1]):
            if cols[t] >= i:
                break
            x[i] -= fvals[t] * x[cols[t]]
    for i in range(n - 1, -1, -1):
        piv = 0.0
        for t in range(indptr[i], indptr[i + 1]):
            j = cols[t]
            if j > i:
                x[i] -= fvals[t] * x[j]
            elif j == i:
                piv = fvals[t]
        x[i] /= piv
    return x


def bicgstab_ilu0(a: CSRMatrix, b, x0, tol, itmax, sweeps: int = 4,
                  dot_dtype=None) -> SolveResult:
    """Right-ILU(0)-preconditioned BiCGSTABwr on a CSR system."""
    M = ilu0_factorize(a)
    minv = partial(M.apply, sweeps=sweeps)

    def wrapped(y):
        return a.matvec(minv(y))

    res = bicgstab_wr(wrapped, b, M.matvec(x0), tol, itmax, dot_dtype=dot_dtype)
    return SolveResult(x=minv(res.x), iterations=res.iterations,
                       relres=res.relres, converged=res.converged)
