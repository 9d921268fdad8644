"""Posterior variance and HMC tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.distributed.sharded import make_mesh
from sympgpr_tpu.gp import hmc, likelihood, predict
from sympgpr_tpu.gp.model import AuxGP, SympGP
from sympgpr_tpu.kernels import PER_SE


def _models(n=10, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, P], 1))
    z = jnp.asarray(np.concatenate([0.2 * np.sin(q), 0.1 * np.cos(q) * P]))
    sgp = SympGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-8, X, z)
    aux = AuxGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-8, X,
                       z[:n], delta=True)
    return sgp, aux


def test_predict_df_mean_matches_map_machinery():
    from sympgpr_tpu.maps.symplectic import dF_mean

    sgp, _ = _models()
    V = jnp.asarray([[0.5, 0.2], [2.0, -0.3]])
    mean, var = predict.predict_df(sgp, V)
    for i in range(2):
        ref = dF_mean(sgp, V[i])
        np.testing.assert_allclose(np.asarray(mean[i]), np.asarray(ref),
                                   rtol=1e-10)
    assert np.all(np.asarray(var) >= 0)


def test_predict_variance_zero_at_train_points():
    sgp, aux = _models()
    mean, var = predict.predict_df(sgp, sgp.X[:3])
    assert float(np.max(np.asarray(var))) < 1e-5  # ~sig2n-level
    m2, v2 = predict.predict_aux(aux, aux.X[:3])
    np.testing.assert_allclose(np.asarray(m2), np.asarray(aux.z[:3]),
                               atol=1e-5)
    assert float(np.max(np.asarray(v2))) < 1e-5


def test_predict_variance_grows_far_from_data():
    sgp, _ = _models()
    _, var_near = predict.predict_df(sgp, sgp.X[:1])
    far = jnp.asarray([[3.0, 25.0]])  # P far outside the data
    _, var_far = predict.predict_df(sgp, far)
    prior = float(sgp.sig * sgp.kernel.hess_uv(far[0], far[0],
                                               sgp.params)[0, 0])
    assert float(var_far[0, 0]) > 100 * float(var_near[0, 0] + 1e-12)
    np.testing.assert_allclose(float(var_far[0, 0]), prior, rtol=1e-3)


def test_hmc_samples_gaussian():
    """HMC on a known 2-D Gaussian: moments must match."""

    def logprob(x):
        return -0.5 * (x[0] ** 2 / 1.0 + x[1] ** 2 / 4.0)

    x0s = jnp.zeros((4, 2)) + jnp.asarray([[0.1], [-0.1], [0.2], [-0.2]])
    res = hmc.sample_hmc(logprob, x0s, 800, n_warmup=200, step_size=0.4,
                         n_leapfrog=8, seed=0)
    s = np.asarray(res.samples).reshape(-1, 2)
    assert float(res.accept_rate.min()) > 0.5
    np.testing.assert_allclose(s.mean(0), [0, 0], atol=0.15)
    np.testing.assert_allclose(s.var(0), [1.0, 4.0], rtol=0.2)


def test_hmc_over_gp_hyperparameters():
    sgp, _ = _models()
    logprob = hmc.nll_logprob(PER_SE, sgp.X, sgp.z, 1e-8, likelihood.nll)
    x0s = jnp.zeros((2, 3)) + jnp.asarray([[0.0], [0.2]])
    res = hmc.sample_hmc(logprob, x0s, 50, n_warmup=50, step_size=0.02,
                         n_leapfrog=8, seed=1)
    assert np.isfinite(np.asarray(res.log_probs)).all()
    assert float(res.accept_rate.min()) > 0.2


def test_hmc_sharded_runs():
    mesh = make_mesh(jax.devices()[:8])

    def logprob(x):
        return -0.5 * jnp.sum(x**2)

    x0s = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)))
    res = hmc.sample_hmc_sharded(logprob, x0s, mesh, 100, n_warmup=50,
                                 step_size=0.3, n_leapfrog=8)
    assert res.samples.shape == (8, 100, 2)
    assert np.isfinite(np.asarray(res.samples)).all()


def test_hmc_step_size_adaptation():
    """Dual-averaging warmup reaches ~target acceptance on a Gaussian."""

    def logprob(x):
        return -0.5 * jnp.sum(x**2)

    x0s = jnp.zeros((4, 3)) + 0.1
    res = hmc.sample_hmc(logprob, x0s, 800, n_warmup=400, step_size=1e-3,
                         n_leapfrog=8, seed=2, adapt_step_size=True)
    # started at a uselessly tiny step size; find_reasonable_eps + dual
    # averaging should reach an acceptance rate near the 0.8 target (well
    # away from ~1.0 at eps→0)
    acc = np.asarray(res.accept_rate)
    assert np.all(acc > 0.55) and np.all(acc < 0.99)
    s = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(s.var(0), np.ones(3), rtol=0.4)
