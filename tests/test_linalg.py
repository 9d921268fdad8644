"""Distributed Cholesky vs stock jnp.linalg.cholesky.

(The single-device blocked variant was measured slower than XLA at f32
precision and deleted — see linalg/cholesky.py module docstring.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.distributed.sharded import make_mesh
from sympgpr_tpu.linalg.cholesky import distributed_cholesky


def spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices()[:8])


def test_distributed_matches_stock(mesh):
    # kp axis size from make_mesh factoring of 8 devices
    K = spd(256, seed=2)
    L = distributed_cholesky(K, mesh, axis="kp", block=32)
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), rtol=1e-9,
                               atol=1e-9)


def test_distributed_reconstructs(mesh):
    K = spd(128, seed=3)
    L = np.asarray(distributed_cholesky(K, mesh, axis="kp", block=16))
    np.testing.assert_allclose(L @ L.T, np.asarray(K), rtol=1e-9, atol=1e-8)
    assert np.allclose(L, np.tril(L))

