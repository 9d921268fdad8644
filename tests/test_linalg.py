"""Blocked / distributed Cholesky vs stock jnp.linalg.cholesky."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.distributed.sharded import make_mesh
from sympgpr_tpu.linalg.cholesky import blocked_cholesky, distributed_cholesky


def spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_blocked_matches_stock():
    K = spd(512)
    L = blocked_cholesky(K, block=128)
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), rtol=1e-9,
                               atol=1e-9)


def test_blocked_various_block_sizes():
    K = spd(256, seed=1)
    L_ref = np.asarray(jnp.linalg.cholesky(K))
    for b in (32, 64, 256):
        L = np.asarray(blocked_cholesky(K, block=b))
        np.testing.assert_allclose(L, L_ref, rtol=1e-9, atol=1e-9)


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
