"""Pallas tiled covariance builder vs the autodiff/closed-form builds.

Runs in interpret mode on the CPU backend (auto-selected inside
``build_K_pallas``); the same program compiles on TPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.gp import likelihood
from sympgpr_tpu.gp.covariance import build_K, build_K_fast
from sympgpr_tpu.kernels import PER_SE, PER_SE_FREQ, SE_SE, SUM_PER_SE
from sympgpr_tpu.ops import pallas_cov

KERNELS = {
    "per_se": (PER_SE, [0.9, 1.7]),
    "se_se": (SE_SE, [1.1, 0.8]),
    "per_se_freq": (PER_SE_FREQ, [0.9, 1.7, 0.37]),
    "sum_per_se": (SUM_PER_SE, [0.9, 1.7]),
}


def _points(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack([rng.uniform(0, 2 * np.pi, n),
                  rng.uniform(-2.0, 2.0, n)], 1), jnp.float32)


@pytest.mark.parametrize("name", sorted(KERNELS))
@pytest.mark.parametrize("n,n0", [(70, 40), (256, 256), (300, 130)])
def test_build_matches_autodiff(name, n, n0):
    kernel, params = KERNELS[name]
    X, X0 = _points(n, 0), _points(n0, 1)
    p = jnp.asarray(params, jnp.float32)
    sig = jnp.asarray(2.5, jnp.float32)
    K_ref = build_K(kernel, X, X0, p, sig)
    K_pl = pallas_cov.build_K_pallas(kernel, X, X0, p, sig)
    assert K_pl.shape == (2 * n, 2 * n0)
    scale = float(jnp.max(jnp.abs(K_ref)))
    np.testing.assert_allclose(np.asarray(K_pl), np.asarray(K_ref),
                               atol=2e-6 * scale, rtol=2e-5)


@pytest.mark.parametrize("name", ["per_se", "per_se_freq", "sum_per_se"])
def test_vjp_matches_closed_form(name):
    kernel, params = KERNELS[name]
    X = _points(48, 2)
    p = jnp.asarray(params, jnp.float32)
    sig = jnp.asarray(1.8, jnp.float32)
    W = jnp.asarray(
        np.random.default_rng(3).normal(size=(96, 96)), jnp.float32)

    def loss_pl(p, s):
        return jnp.sum(W * pallas_cov.build_K_pallas(kernel, X, X, p, s))

    def loss_ref(p, s):
        return jnp.sum(W * build_K_fast(kernel, X, X, p, s))

    gp_pl, gs_pl = jax.grad(loss_pl, argnums=(0, 1))(p, sig)
    gp_rf, gs_rf = jax.grad(loss_ref, argnums=(0, 1))(p, sig)
    np.testing.assert_allclose(np.asarray(gp_pl), np.asarray(gp_rf),
                               rtol=3e-4)
    np.testing.assert_allclose(float(gs_pl), float(gs_rf), rtol=3e-4)


def test_nll_dispatches_to_pallas(monkeypatch):
    """With the threshold forced down, nll must route through the Pallas
    build and agree with the default path (f32 tolerance)."""
    X = _points(64, 4)
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=128) * 0.1, jnp.float32)
    p = jnp.asarray([0.9, 1.7], jnp.float32)
    sig = jnp.asarray(2.0, jnp.float32)
    s2 = jnp.asarray(1e-4, jnp.float32)

    v_default = likelihood.nll(PER_SE, p, sig, s2, X, z)
    monkeypatch.setitem(os.environ, pallas_cov._THRESHOLD_ENV, "1")
    assert pallas_cov.want_pallas_build(PER_SE, X)
    v_pallas = likelihood.nll(PER_SE, p, sig, s2, X, z)
    # the ill-conditioned solve amplifies the f32 build noise; 1e-3 relative
    # on the NLL value is the expected scale
    np.testing.assert_allclose(float(v_pallas), float(v_default), rtol=1e-3)


def test_f64_stays_on_xla_path():
    X = jnp.asarray(np.asarray(_points(16, 6)), jnp.float64)
    assert not pallas_cov.want_pallas_build(PER_SE, X)
