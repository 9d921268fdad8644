"""The manual (closed-form) NLL gradient path vs autodiff.

Covers the round-3 training-step optimization: blocked triangular
inverse (``linalg/triangular.py``), the Pallas syrk (interpret mode on
CPU), the Pallas hyperparameter-gradient contraction
(``ops/pallas_cov.py::cov_param_grads``), and the assembled
``nll_value_and_grad`` against ``jax.value_and_grad`` of the stock NLL.
Float64 on CPU: parity here is exact math, not noise-vs-noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.gp import likelihood
from sympgpr_tpu.gp.covariance import build_K_fast
from sympgpr_tpu.kernels import PER_SE, PER_SE_FREQ, SE_SE, SUM_PER_SE
from sympgpr_tpu.linalg.triangular import spd_inverse_from_chol, \
    tri_inv_blocked
from sympgpr_tpu.ops import pallas_cov
from sympgpr_tpu.ops.pallas_syrk import syrk_lower

KERNELS = {
    "per_se": (PER_SE, [0.9, 1.7]),
    "se_se": (SE_SE, [1.1, 0.8]),
    "per_se_freq": (PER_SE_FREQ, [0.9, 1.7, 0.37]),
    "sum_per_se": (SUM_PER_SE, [0.9, 1.7]),
}


def _points(n, seed, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack([rng.uniform(0, 2 * np.pi, n),
                  rng.uniform(-2.0, 2.0, n)], 1), dtype)


@pytest.mark.parametrize("n", [8, 100, 256, 515])
def test_tri_inv_blocked(n):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n))
    L = np.tril(A) + n * np.eye(n)
    W = np.asarray(tri_inv_blocked(jnp.asarray(L), base=64))
    np.testing.assert_allclose(W @ L, np.eye(n), atol=1e-10)
    # strictly lower-triangular structure preserved
    assert np.allclose(np.triu(W, 1), 0.0)


@pytest.mark.parametrize("n", [64, 200, 256])
def test_syrk_lower(n):
    rng = np.random.default_rng(n)
    W = jnp.asarray(np.tril(rng.standard_normal((n, n))))
    S = np.asarray(syrk_lower(W, tile=128))
    np.testing.assert_allclose(S, np.asarray(W.T @ W), atol=1e-10)


def test_spd_inverse_from_chol():
    rng = np.random.default_rng(0)
    n = 96
    A = rng.standard_normal((n, n))
    Ky = A @ A.T + n * np.eye(n)
    L = np.linalg.cholesky(Ky)
    Kyinv = np.asarray(spd_inverse_from_chol(jnp.asarray(L), base=32))
    np.testing.assert_allclose(Kyinv @ Ky, np.eye(n), atol=1e-9)


@pytest.mark.parametrize("name", sorted(KERNELS))
def test_cov_param_grads_f64(name):
    """Pallas contraction (interpret, f64) vs autodiff of the XLA build."""
    kernel, params = KERNELS[name]
    N, N0 = 40, 24
    X, X0 = _points(N, 1), _points(N0, 2)
    p = jnp.asarray(params, jnp.float64)
    sig = jnp.asarray(1.8, jnp.float64)
    Kbar = jnp.asarray(
        np.random.default_rng(3).normal(size=(2 * N, 2 * N0)))

    dp, ds = pallas_cov.cov_param_grads(name, X, X0, p, sig, Kbar,
                                        tile=256, interpret=True)
    _, vjp = jax.vjp(lambda q, s: build_K_fast(kernel, X, X0, q, s), p, sig)
    dp_ref, ds_ref = vjp(Kbar)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(ds), float(ds_ref), rtol=1e-9)


@pytest.mark.parametrize("name", ["per_se", "per_se_freq"])
def test_nll_value_and_grad_matches_autodiff(name):
    kernel, params = KERNELS[name]
    N = 48
    X = _points(N, 4)
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=2 * N) * 0.3)
    p = jnp.asarray(params, jnp.float64)
    sig = jnp.asarray(2.0, jnp.float64)
    s2 = jnp.asarray(1e-6, jnp.float64)

    val, dp, ds = likelihood.nll_value_and_grad(kernel, p, sig, s2, X, z)
    ref = likelihood.nll(kernel, p, sig, s2, X, z)
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-12)
    gp_ref, gs_ref = jax.grad(
        lambda q, s: likelihood.nll(kernel, q, s, s2, X, z),
        argnums=(0, 1))(p, sig)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(gp_ref),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(float(ds), float(gs_ref), rtol=1e-8)


def test_nll_value_and_grad_theta():
    N = 32
    X = _points(N, 6)
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.normal(size=2 * N) * 0.3)
    s2 = jnp.asarray(1e-6, jnp.float64)
    theta = jnp.asarray([-0.1, 0.2, 0.4])

    val, g = likelihood.nll_value_and_grad_theta(PER_SE, theta, s2, X, z)

    def obj(t):
        hyp = 10.0 ** t
        return likelihood.nll(PER_SE, hyp[:-1], hyp[-1], s2, X, z)

    v_ref, g_ref = jax.value_and_grad(obj)(theta)
    np.testing.assert_allclose(float(val), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-12)


def test_trimm_matches_dense():
    """Triangular-aware Pallas matmuls vs dense (interpret mode)."""
    from sympgpr_tpu.ops.pallas_trimm import (
        matmul_tril_left, matmul_tril_right)

    rng = np.random.default_rng(3)
    nb, s, tile = 2, 256, 128
    A = jnp.asarray(rng.standard_normal((nb, s, s)))
    Lt = jnp.asarray(np.tril(rng.standard_normal((nb, s, s))))
    R = np.asarray(matmul_tril_right(A, Lt, tile=tile, precision="highest"))
    np.testing.assert_allclose(R, np.asarray(A) @ np.asarray(Lt),
                               atol=1e-10)
    Lf = np.asarray(matmul_tril_left(Lt, A, tile=tile, precision="highest"))
    np.testing.assert_allclose(Lf, np.asarray(Lt) @ np.asarray(A),
                               atol=1e-10)


def test_trimm_ignores_upper_garbage():
    """Upper-triangle tiles of L must never be read (clamped index maps
    skip them); fill them with NaN and require a clean result."""
    from sympgpr_tpu.ops.pallas_trimm import matmul_tril_right

    rng = np.random.default_rng(4)
    nb, s, tile = 1, 256, 128
    A = jnp.asarray(rng.standard_normal((nb, s, s)))
    Lt = np.tril(rng.standard_normal((nb, s, s)))
    poisoned = Lt.copy()
    # poison only the strictly-upper TILES (the in-tile upper triangle of
    # diagonal tiles is read-but-multiplied-by-zero in exact arithmetic,
    # so it must stay finite)
    poisoned[:, :tile, tile:] = np.nan
    R = np.asarray(matmul_tril_right(A, jnp.asarray(poisoned), tile=tile,
                                     precision="highest"))
    np.testing.assert_allclose(R, np.asarray(A) @ Lt, atol=1e-10)


@pytest.mark.parametrize("n", [256, 515])
def test_tri_inv_blocked_trimm_path(n):
    """tri_inv with the Pallas triangular matmuls (interpret) must match
    the XLA-dot path bit-for-bit in structure and to fp tolerance."""
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n))
    L = np.tril(A) + n * np.eye(n)
    W = np.asarray(tri_inv_blocked(jnp.asarray(L), base=128,
                                   precision="highest", trimm=True,
                                   trimm_tile=128))
    np.testing.assert_allclose(W @ L, np.eye(n), atol=1e-10)
    assert np.allclose(np.triu(W, 1), 0.0)
