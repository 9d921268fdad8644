"""Posterior mean and variance prediction.

The reference only ever uses posterior means (``guessP``/``calcQ``/``calcP``,
``python/05_tokamak/SympGPR/sympgpr.f90:62-125``); posterior variances are a
north-star capability (BASELINE.json: "posterior predictive means/variances
... must match within Monte-Carlo error").  With the Cholesky factor stored
on the fitted model, the predictive variance is
``k**(v,v) - ||L^-1 k*(v)||^2`` per derivative component.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from sympgpr_tpu.gp.model import AuxGP, SympGP

Array = jax.Array


def _kstar_deriv(sgp: SympGP, v: Array) -> Array:
    """(2N, 2) cross-covariance columns between the training derivative
    observations and the two derivative components at test point v."""
    n = sgp.n_train
    H = jax.vmap(lambda u: sgp.kernel.hess_uv(u, v, sgp.params))(sgp.X)
    # rows: [dq block | dP block] stacked, cols: test components
    return sgp.sig * jnp.concatenate([H[:, 0, :], H[:, 1, :]], axis=0)


def predict_df(sgp: SympGP, V: Array, with_var: bool = True):
    """Posterior of (dF/dq, dF/dP) = (p - P, Q - q) at test points V (M, 2).

    Returns (mean (M, 2), var (M, 2) or None).
    """
    if with_var and sgp.L.shape[0] == 0:
        raise ValueError(
            "posterior variance unavailable: this model was fitted "
            "without a dense Cholesky factor (distributed fit_large). "
            "Use distributed.large.predict_df_large(model, mesh, V) for "
            "a distributed variance, predict_df(..., with_var=False) for "
            "means only, or refit with SympGP.create at a "
            "single-device size."
        )

    def one(v):
        Ks = _kstar_deriv(sgp, v)  # (2N, 2)
        mean = Ks.T @ sgp.alpha
        if not with_var:
            return mean, jnp.zeros(2, dtype=mean.dtype)
        prior = sgp.sig * jnp.diagonal(sgp.kernel.hess_uv(v, v, sgp.params))
        W = solve_triangular(sgp.L, Ks, lower=True)
        var = prior - jnp.sum(W * W, axis=0)
        return mean, jnp.maximum(var, 0.0)

    means, vars_ = jax.vmap(one)(V)
    return (means, vars_) if with_var else (means, None)


def predict_aux(aux: AuxGP, V: Array, with_var: bool = True):
    """Posterior of the auxiliary GP target at test points V (M, 2)."""

    def one(v):
        kvec = aux.sig * jax.vmap(
            lambda u: aux.kernel.fn(u, v, aux.params)
        )(aux.X)
        mean = kvec @ aux.alpha
        if not with_var:
            return mean, jnp.zeros((), dtype=mean.dtype)
        prior = aux.sig * aux.kernel.fn(v, v, aux.params)
        w = solve_triangular(aux.L, kvec, lower=True)
        return mean, jnp.maximum(prior - w @ w, 0.0)

    means, vars_ = jax.vmap(one)(V)
    return (means, vars_) if with_var else (means, None)
