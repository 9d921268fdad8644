"""Covariance layout tests vs a brute-force scalar-loop builder that mirrors
the reference's ``build_K`` (``python/01_pendulum/implicit/func.py:44-64``)."""

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.gp.covariance import build_K, build_Kreg, pack_points, unpack_flat
from sympgpr_tpu.kernels import PER_SE


def brute_force_K(kernel, X, X0, params, sig):
    N, N0 = X.shape[0], X0.shape[0]
    K = np.zeros((2 * N, 2 * N0))
    for i in range(N):
        for j in range(N0):
            H = np.asarray(kernel.hess_uv(X[i], X0[j], params))
            K[i, j] = H[0, 0]
            K[N + i, j] = H[1, 0]
            K[i, N0 + j] = H[0, 1]
            K[N + i, N0 + j] = H[1, 1]
    return sig * K


def test_build_K_matches_brute_force():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, (5, 2)))
    X0 = jnp.asarray(rng.uniform(-1, 1, (3, 2)))
    params = jnp.array([0.8, 1.1])
    K = build_K(PER_SE, X, X0, params, 2.5)
    Kb = brute_force_K(PER_SE, X, X0, params, 2.5)
    np.testing.assert_allclose(K, Kb, rtol=1e-13, atol=1e-14)


def test_build_K_symmetric_psd():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(-2, 2, (12, 2)))
    K = np.asarray(build_K(PER_SE, X, X, jnp.array([0.9, 1.2]), 1.0))
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-10 * abs(w.max())


def test_build_Kreg_matches_direct():
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform(-1, 1, (4, 2)))
    X0 = jnp.asarray(rng.uniform(-1, 1, (6, 2)))
    params = jnp.array([0.8, 1.1])
    K = np.asarray(build_Kreg(PER_SE, X, X0, params, 3.0))
    for i in range(4):
        for j in range(6):
            np.testing.assert_allclose(
                K[i, j], 3.0 * float(PER_SE.fn(X[i], X0[j], params)),
                rtol=1e-13,
            )


def test_pack_unpack():
    q = jnp.arange(4.0)
    P = jnp.arange(4.0) + 10
    X = pack_points(q, P)
    assert X.shape == (4, 2)
    flat = jnp.concatenate([q, P])
    np.testing.assert_allclose(unpack_flat(flat), X)


def test_build_K_fast_matches_autodiff():
    from sympgpr_tpu.gp.covariance import build_K_fast
    from sympgpr_tpu.kernels import PER_SE_FREQ, SE_SE, SUM_PER_SE

    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(-2, 2, (7, 2)))
    X0 = jnp.asarray(rng.uniform(-2, 2, (5, 2)))
    for kernel in (PER_SE, SE_SE, PER_SE_FREQ, SUM_PER_SE):
        params = jnp.array([0.9, 1.2, 0.7])[: kernel.n_params]
        Kf = build_K_fast(kernel, X, X0, params, 2.0)
        Ka = build_K(kernel, X, X0, params, 2.0)
        np.testing.assert_allclose(np.asarray(Kf), np.asarray(Ka),
                                   rtol=1e-12, atol=1e-13)
