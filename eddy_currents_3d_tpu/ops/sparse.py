"""General sparse containers (CSR / COO / ELL) with device SpMV.

The simulation hot path uses the structured stencil operator
(assembly/stencil.py) — gather-free and TPU-friendly.  This module is the
*general* sparse tier the framework also provides: unstructured matrices
for interop, tests, and irregular couplings, stored as pytrees with jittable
SpMV.  The CSR product reproduces the semantics of the reference kernel
``sprsAx`` (solvers.f90:54-61).

On TPU, ELL (padded fixed-width rows) is the preferred general layout: the
gather of ``x[col]`` is the unavoidable cost, but values/columns stream
densely.  CSR SpMV is expressed as a segment-sum over the COO expansion,
which XLA lowers to scatter-adds — fine on CPU, slower on TPU; use ELL
there.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CSRMatrix", "COOMatrix", "ELLMatrix", "from_scipy"]


@dataclass(frozen=True)
class COOMatrix:
    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    shape: tuple[int, int]

    def matvec(self, x: jax.Array) -> jax.Array:
        prod = self.vals * x[self.cols]
        return jax.ops.segment_sum(prod, self.rows, num_segments=self.shape[0])

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, self.vals.dtype)
        return out.at[self.rows, self.cols].add(self.vals)


jax.tree_util.register_dataclass(
    COOMatrix, data_fields=["rows", "cols", "vals"], meta_fields=["shape"]
)


@dataclass(frozen=True)
class CSRMatrix:
    """Compressed sparse row; ``indptr`` (n+1,), ``cols``/``vals`` (nnz,)."""

    indptr: jax.Array
    cols: jax.Array
    vals: jax.Array
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return self.cols.shape[0]

    def row_lengths(self) -> jax.Array:
        return self.indptr[1:] - self.indptr[:-1]

    def row_ids(self) -> jax.Array:
        """Expand indptr to a per-nnz row index — traceable under jit
        (scatter a 1 at each row start, then prefix-sum)."""
        nnz = self.cols.shape[0]
        starts = jnp.zeros(nnz, jnp.int32).at[self.indptr[1:-1]].add(1)
        return jnp.cumsum(starts)

    def to_coo(self) -> COOMatrix:
        return COOMatrix(rows=self.row_ids(), cols=self.cols, vals=self.vals,
                         shape=self.shape)

    def matvec(self, x: jax.Array) -> jax.Array:
        """y[i] = sum_j vals[indptr[i]:indptr[i+1]] * x[cols[...]]
        (sprsAx semantics, solvers.f90:57-60)."""
        prod = self.vals * x[self.cols]
        return jax.ops.segment_sum(prod, self.row_ids(), num_segments=self.shape[0])

    def to_ell(self, width: int | None = None) -> "ELLMatrix":
        indptr = np.asarray(self.indptr)
        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        lens = np.diff(indptr)
        w = int(lens.max()) if width is None else width
        n = self.shape[0]
        ecols = np.zeros((n, w), cols.dtype)
        evals = np.zeros((n, w), vals.dtype)
        for i in range(n):
            k = lens[i]
            ecols[i, :k] = cols[indptr[i]:indptr[i] + k]
            evals[i, :k] = vals[indptr[i]:indptr[i] + k]
        return ELLMatrix(cols=jnp.asarray(ecols), vals=jnp.asarray(evals), shape=self.shape)


jax.tree_util.register_dataclass(
    CSRMatrix, data_fields=["indptr", "cols", "vals"], meta_fields=["shape"]
)


@dataclass(frozen=True)
class ELLMatrix:
    """Padded fixed-width rows: cols/vals are (n, width); padding has
    val == 0 (its column index is arbitrary but in range)."""

    cols: jax.Array
    vals: jax.Array
    shape: tuple[int, int]

    def matvec(self, x: jax.Array) -> jax.Array:
        return jnp.sum(self.vals * x[self.cols], axis=1)


jax.tree_util.register_dataclass(
    ELLMatrix, data_fields=["cols", "vals"], meta_fields=["shape"]
)


def from_scipy(m, dtype=jnp.float32) -> CSRMatrix:
    m = m.tocsr()
    return CSRMatrix(
        indptr=jnp.asarray(m.indptr, jnp.int32),
        cols=jnp.asarray(m.indices, jnp.int32),
        vals=jnp.asarray(m.data, dtype),
        shape=tuple(m.shape),
    )
