"""General sparse tier (ops/sparse.py) vs scipy."""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from eddy_currents_3d_tpu.ops.sparse import from_scipy


def _rand_csr(rng, n=60, density=0.08):
    m = sparse.random(n, n, density=density, random_state=np.random.RandomState(3))
    m = m.tocsr()
    m.setdiag(1.0)
    return m


def test_csr_matvec(rng):
    m = _rand_csr(rng)
    x = rng.standard_normal(m.shape[1])
    ours = from_scipy(m, jnp.float64)
    np.testing.assert_allclose(np.asarray(ours.matvec(jnp.asarray(x))), m @ x, rtol=1e-12)


def test_coo_and_dense(rng):
    m = _rand_csr(rng, n=30)
    ours = from_scipy(m, jnp.float64)
    coo = ours.to_coo()
    x = rng.standard_normal(30)
    np.testing.assert_allclose(np.asarray(coo.matvec(jnp.asarray(x))), m @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(coo.todense()), m.toarray(), rtol=1e-12)


def test_ell_matvec(rng):
    m = _rand_csr(rng, n=50)
    ours = from_scipy(m, jnp.float64)
    ell = ours.to_ell()
    x = rng.standard_normal(50)
    np.testing.assert_allclose(np.asarray(ell.matvec(jnp.asarray(x))), m @ x, rtol=1e-12)
    assert ell.vals.shape[1] == int(np.diff(m.indptr).max())


def test_jit_and_tree_flatten(rng):
    import jax
    m = _rand_csr(rng, n=40)
    ours = from_scipy(m, jnp.float64)
    x = rng.standard_normal(40)
    f = jax.jit(lambda mat, v: mat.matvec(v))
    np.testing.assert_allclose(np.asarray(f(ours, jnp.asarray(x))), m @ x, rtol=1e-12)
