"""Optimizer driver tests (L-BFGS, native CMA-ES, Adam)."""

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.gp import likelihood
from sympgpr_tpu.gp.train import (
    fit_auxgp,
    make_objective,
    minimize_adam,
    minimize_cmaes,
    minimize_lbfgs,
)
from sympgpr_tpu.kernels import PER_SE


def rosenbrock(x):
    return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def test_cmaes_rosenbrock():
    res = minimize_cmaes(rosenbrock, [-1.0, 1.0], sigma0=0.5, maxiter=400,
                         seed=0)
    np.testing.assert_allclose(res.theta, [1.0, 1.0], atol=2e-2)
    assert res.fun < 1e-3


def test_cmaes_restarts_improve_or_match():
    res0 = minimize_cmaes(rosenbrock, [-1.0, 1.0], maxiter=60, seed=1)
    res1 = minimize_cmaes(rosenbrock, [-1.0, 1.0], maxiter=60, seed=1,
                          restarts=1)
    assert res1.fun <= res0.fun + 1e-12


def test_lbfgs_and_adam_agree_on_gp_fit():
    rng = np.random.default_rng(0)
    n = 10
    q = rng.uniform(0, 2 * np.pi, n)
    p = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, p], 1))
    z = jnp.asarray(0.5 * np.sin(q) + 0.2 * p)
    obj = make_objective(likelihood.nll_reg, PER_SE, X, z, 1e-6,
                         transform="log10", fixed_sig=1.0)
    r_lb = minimize_lbfgs(obj, [0.0, 0.0])
    r_ad = minimize_adam(obj, [0.0, 0.0], lr=3e-2, steps=400)
    assert abs(r_lb.fun - r_ad.fun) < 0.5  # same basin, similar NLL


def test_fit_auxgp_cmaes_path():
    rng = np.random.default_rng(1)
    n = 12
    q = rng.uniform(0, 2 * np.pi, n)
    p = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, p], 1))
    z = jnp.asarray(0.5 * np.sin(q) * p)
    aux, res = fit_auxgp(
        PER_SE, X, z, sig2n=1e-8, x0=(-0.5, 0.0, 0.0), optimizer="cmaes",
        maxiter=60, seed=0,
    )
    assert res.success
    assert np.isfinite(float(aux.training_error())) if hasattr(
        aux, "training_error") else True
    # posterior reproduces targets decently
    from sympgpr_tpu.gp.covariance import build_Kreg

    K = build_Kreg(PER_SE, aux.X, aux.X, aux.params, aux.sig)
    pred = K @ aux.alpha
    assert float(jnp.mean((pred - z) ** 2)) < 1e-3


def test_fit_batch_adam():
    """Batched vmapped fits track individual fits."""
    import jax

    from sympgpr_tpu.gp.train import fit_batch_adam, minimize_adam

    rng = np.random.default_rng(2)
    M, n = 3, 8
    Xs, zs = [], []
    for m in range(M):
        q = rng.uniform(0, 2 * np.pi, n)
        P = rng.uniform(-1, 1, n)
        Xs.append(np.stack([q, P], 1))
        zs.append(np.concatenate([0.2 * np.sin(q), 0.1 * np.cos(q) * P]))
    Xs, zs = np.stack(Xs), np.stack(zs)

    thetas, nlls = fit_batch_adam(
        PER_SE, Xs, zs, sig2n=1e-6, x0=(0.0, 0.0, 0.0), steps=200,
    )
    assert thetas.shape == (M, 3)
    assert np.isfinite(np.asarray(nlls)).all()
    # individual fit of dataset 0 reaches a comparable NLL
    obj = make_objective(likelihood.nll, PER_SE, jnp.asarray(Xs[0]),
                         jnp.asarray(zs[0]), 1e-6, transform="log10")
    r = minimize_adam(obj, [0.0, 0.0, 0.0], steps=200)
    assert float(nlls[0]) < r.fun + 1.0
