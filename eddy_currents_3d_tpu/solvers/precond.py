"""Preconditioning for the Krylov solvers.

The reference runs unpreconditioned (solvers.f90) — these are opt-in
accelerators for the TPU build.  Jacobi (diagonal) preconditioning is
applied as *right* preconditioning, so the residual history and the
convergence test remain those of the original system: we solve
``(A D^-1) y = b`` with ``x = D^-1 y`` and warm-start ``y0 = D x0``.
"""

from __future__ import annotations

from typing import Callable

import jax

from .bicgstab import bicgstab_wr, SolveResult

__all__ = ["jacobi_right_preconditioned"]


def jacobi_right_preconditioned(
    apply_fn: Callable,
    diag,               # pytree of the operator diagonal (no zeros)
):
    """Returns (wrapped_apply, to_y, from_y) for right-Jacobi preconditioning."""
    inv = jax.tree.map(lambda d: 1.0 / d, diag)

    def minv(v):
        return jax.tree.map(lambda a, b: a * b, inv, v)

    def wrapped(v):
        return apply_fn(minv(v))

    def to_y(x):
        return jax.tree.map(lambda d, xi: d * xi, diag, x)

    return wrapped, to_y, minv


def bicgstab_jacobi(apply_fn, diag, b, x0, tol, itmax, dot_dtype=None) -> SolveResult:
    wrapped, to_y, from_y = jacobi_right_preconditioned(apply_fn, diag)
    res = bicgstab_wr(wrapped, b, to_y(x0), tol, itmax, dot_dtype=dot_dtype)
    return SolveResult(x=from_y(res.x), iterations=res.iterations,
                       relres=res.relres, converged=res.converged)
