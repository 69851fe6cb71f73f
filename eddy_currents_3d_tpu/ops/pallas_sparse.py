"""Pallas TPU kernel for block-sparse (BSR / block-ELL) SpMM.

The structured stencil operator (ops/pallas_stencil.py) covers the
simulation hot path; this kernel is the *general* block-sparse tier: MXU
matmuls over dense (R, C) blocks where the sparsity pattern only decides
which block of ``x`` each slot streams in.

Design (the canonical Pallas sparse pattern): the block-column indices are a
**scalar-prefetch** operand — they are available *before* each grid step
runs, so the BlockSpec index map of ``x`` uses ``block_cols[i, w]`` to pick
which x-block the pipeline DMAs into VMEM next.  The sparse gather therefore
rides the normal double-buffered pipeline instead of an in-kernel gather
(TPU has no efficient vector gather).  Grid is (block_rows, width); the
output block revisits row ``i`` across the ``w`` steps and accumulates in
VMEM, initialised at ``w == 0``.

Padding slots (block_cols == 0, all-zero block) contribute exact zeros.

Alignment: for f32 the MXU/VPU want R a multiple of 8 and C (and the dense
RHS width K) multiples of 128; ``bsr_from_scipy`` pads the element grid to
block multiples, and callers should pick block shapes accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import BSRMatrix

__all__ = ["bsr_spmm", "bsr_matvec"]

# set True in tests to run in interpreter mode (works on CPU)
INTERPRET = False


def _kernel(bc_ref, blocks_ref, x_ref, out_ref):
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0] += jnp.dot(
        blocks_ref[0, 0], x_ref[0],
        preferred_element_type=out_ref.dtype,
    )


def bsr_spmm(a: BSRMatrix, x: jax.Array) -> jax.Array:
    """``A @ X`` for dense ``X`` of shape (n_cols, k) via the Pallas kernel."""
    nbr, width, R, C = a.blocks.shape
    n, m = a.shape
    if x.shape[0] != m:
        raise ValueError(f"bsr_spmm: A is {a.shape}, x has leading dim {x.shape[0]}")
    k = x.shape[1]
    xb = x.reshape(m // C, C, k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, width),
        in_specs=[
            pl.BlockSpec((1, 1, R, C), lambda i, w, bc: (i, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, k), lambda i, w, bc: (bc[i, w], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, k), lambda i, w, bc: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr, R, k), a.blocks.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * width * R * C * k,
            bytes_accessed=(a.blocks.size + nbr * width * C * k + nbr * R * k)
            * a.blocks.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(a.block_cols, a.blocks, xb)
    return y.reshape(n, k)


def bsr_matvec(a: BSRMatrix, x: jax.Array, lane_pad: int = 128) -> jax.Array:
    """``A @ x`` for a vector — padded to a lane-aligned SpMM."""
    xk = jnp.pad(x[:, None], [(0, 0), (0, lane_pad - 1)])
    return bsr_spmm(a, xk)[:, 0]
