"""NLL value/gradient tests, including the eigendecomposition fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from sympgpr_tpu.gp.covariance import build_K
from sympgpr_tpu.gp.likelihood import _nll_from_Ky, nll, nll_reg
from sympgpr_tpu.kernels import PER_SE


def _data(n=8, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    z = jnp.asarray(rng.normal(size=2 * n))
    return X, z


def reference_nll(kernel, params, sig, sig2n, X, z):
    """Straight transcription of nll_chol
    (``python/01_pendulum/implicit/func.py:99-108``)."""
    K = np.asarray(build_K(kernel, X, X, params, sig))
    Ky = K + abs(sig2n) * np.eye(K.shape[0])
    L = scipy.linalg.cholesky(Ky, lower=True)
    alpha = scipy.linalg.solve_triangular(
        L.T, scipy.linalg.solve_triangular(L, np.asarray(z), lower=True),
        lower=False,
    )
    return 0.5 * np.asarray(z) @ alpha + np.sum(np.log(np.diag(L)))


def test_nll_matches_reference_formula():
    X, z = _data()
    params = jnp.array([0.9, 1.1])
    v = nll(PER_SE, params, jnp.asarray(2.0), jnp.asarray(1e-8), X, z)
    expected = reference_nll(PER_SE, params, 2.0, 1e-8, X, z)
    np.testing.assert_allclose(v, expected, rtol=1e-10)


def test_nll_grad_matches_fd():
    X, z = _data()

    def f(theta):
        return nll(PER_SE, theta[:2], theta[2], jnp.asarray(1e-6), X, z)

    theta = jnp.array([0.9, 1.1, 2.0])
    g = jax.grad(f)(theta)
    eps = 1e-6
    for i in range(3):
        e = jnp.zeros(3).at[i].set(eps)
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-5, atol=1e-7)


def test_eig_fallback_on_indefinite():
    """An indefinite matrix must yield a finite value via the eigh branch."""
    n = 6
    rng = np.random.default_rng(3)
    A = rng.normal(size=(n, n))
    Ky = jnp.asarray((A + A.T) / 2)  # indefinite
    z = jnp.asarray(rng.normal(size=n))
    v = _nll_from_Ky(Ky, z)
    assert np.isfinite(float(v))


def test_eig_and_chol_agree_on_spd():
    n = 6
    rng = np.random.default_rng(4)
    A = rng.normal(size=(n, n))
    Ky = jnp.asarray(A @ A.T + n * np.eye(n))
    z = jnp.asarray(rng.normal(size=n))
    L = np.linalg.cholesky(np.asarray(Ky))
    alpha = np.linalg.solve(np.asarray(Ky), np.asarray(z))
    direct = 0.5 * np.asarray(z) @ alpha + np.sum(np.log(np.diag(L)))
    np.testing.assert_allclose(_nll_from_Ky(Ky, z), direct, rtol=1e-10)


def test_nll_reg_spd():
    X, z = _data()
    v = nll_reg(PER_SE, jnp.array([1.0, 1.0]), jnp.asarray(1.5),
                jnp.asarray(1e-8), X, z[: X.shape[0]])
    assert np.isfinite(float(v))


def test_chol_and_alpha_jitter_escalation():
    """A semidefinite Ky must be factorized via jitter escalation rather
    than returning NaN alpha."""
    from sympgpr_tpu.gp.likelihood import chol_and_alpha

    n = 6
    v = jnp.ones((n, 1))
    Ky = v @ v.T  # rank-1 PSD, singular
    z = jnp.ones(n)
    L, alpha = chol_and_alpha(Ky, z)
    assert np.isfinite(np.asarray(L)).all()
    assert np.isfinite(np.asarray(alpha)).all()
