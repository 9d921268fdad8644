"""Posterior-parity harness (BASELINE acceptance: "posterior predictive
means/variances ... within Monte-Carlo error").

Ground truth is a deterministic dense-grid quadrature of the pendulum
workload's 3-D GP hyperposterior (boundary mass asserted negligible).
Gates:

1. NUTS posterior moments match the quadrature within Monte-Carlo error.
2. Dual-averaging HMC matches too — regression test for the Stan-style
   ``find_reasonable_eps`` initialization (without it, chains wedged
   all-rejecting on this cliffy posterior at eps0 = 0.02).
3. Hyperparameter-marginalized predictive mean/variance bands at held-out
   phase-space points: NUTS-marginalized vs quadrature-weighted, within
   MC error.
4. Variance calibration: empirical coverage of the point-fit ±2sigma band
   on held-out map targets is consistent with its nominal level.

The reference has no sampling machinery at all (hyperparameters are point
estimates, ``python/01_pendulum/implicit/main.py:142-161``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.gp import hmc, likelihood, nuts, predict
from sympgpr_tpu.gp.model import SympGP
from sympgpr_tpu.kernels import PER_SE
from sympgpr_tpu.systems import pendulum as sys_pend

SIG2N = 1e-8


@pytest.fixture(scope="module")
def pendulum_posterior():
    """Training data + NLL log-posterior of a reduced pendulum workload."""
    cfg = sys_pend.PendulumConfig(N=18)
    data = sys_pend.training_data(cfg)
    X = jnp.asarray(data["X"])
    z = jnp.asarray(data["z"])
    logprob = hmc.nll_logprob(PER_SE, X, z, SIG2N, likelihood.nll)
    # held-out targets: an independent uniform draw through the same
    # one-map-time integration (training uses a Halton set)
    rng = np.random.default_rng(7)
    n2 = 30
    q2 = rng.uniform(cfg.qmin, cfg.qmax, n2)
    p2 = rng.uniform(cfg.pmin, cfg.pmax, n2)
    yf = sys_pend.integrate_rk4(jnp.asarray(q2), jnp.asarray(p2),
                                data["t_map"], 10 * cfg.Nm)
    Q2, P2 = np.asarray(yf[:, 0]), np.asarray(yf[:, 1])
    X_test = jnp.asarray(np.stack([q2, P2], 1))
    z_test = jnp.asarray(np.concatenate([p2 - P2, Q2 - q2]))
    return X, z, logprob, X_test, z_test


@pytest.fixture(scope="module")
def quad_truth(pendulum_posterior):
    """Dense-grid quadrature of the 3-D posterior: the MC-free truth."""
    _, _, logprob, _, _ = pendulum_posterior
    lo = np.array([1.0, 0.7, 0.5])
    hi = np.array([2.4, 1.7, 4.5])
    ng = 40
    axes = [np.linspace(lo[i], hi[i], ng) for i in range(3)]
    G = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    lp_fn = jax.jit(jax.vmap(logprob))
    lp = np.concatenate([np.asarray(lp_fn(jnp.asarray(G[i:i + 4096])))
                         for i in range(0, len(G), 4096)])
    w = np.exp(lp - lp.max())
    w /= w.sum()
    # the box must contain essentially all mass or the truth is clipped
    edge = np.zeros(len(G), bool)
    for i in range(3):
        edge |= (G[:, i] <= axes[i][1]) | (G[:, i] >= axes[i][-2])
    assert w[edge].sum() < 1e-3, "posterior mass leaks out of the box"
    mean = (w[:, None] * G).sum(0)
    std = np.sqrt((w[:, None] * (G - mean) ** 2).sum(0))
    return G, w, mean, std


@pytest.fixture(scope="module")
def nuts_chains(pendulum_posterior):
    _, _, logprob, _, _ = pendulum_posterior
    rng = np.random.default_rng(0)
    x0 = np.asarray([0.0, 0.0, 0.7])
    x0s = jnp.asarray(x0[None] + 0.05 * rng.standard_normal((4, 3)))
    r = nuts.sample_nuts(logprob, x0s, 250, n_warmup=150, step_size=0.05,
                         max_depth=6, seed=1)
    assert float(np.min(np.asarray(r.accept_stat))) > 0.5
    return np.asarray(r.samples).reshape(-1, 3)


def _mc_err(s):
    """Conservative MC standard error: IID formula x 5 autocorrelation
    inflation (these chains mix well; measured IACT < 5)."""
    return 5.0 * s.std(0) / np.sqrt(len(s))


def _assert_within(actual, desired, tol, what):
    diff = np.abs(np.asarray(actual) - np.asarray(desired))
    assert np.all(diff <= tol), f"{what}: |{actual} - {desired}| > {tol}"


def test_nuts_matches_quadrature_moments(nuts_chains, quad_truth):
    _, _, mean, std = quad_truth
    tol = 3.0 * np.maximum(_mc_err(nuts_chains), 1e-3)
    _assert_within(nuts_chains.mean(0), mean, tol, "NUTS posterior mean")
    np.testing.assert_allclose(nuts_chains.std(0), std, rtol=0.3)


def test_adaptive_hmc_matches_quadrature_moments(pendulum_posterior,
                                                 quad_truth):
    """Dual-averaging HMC with find_reasonable_eps initialization; the
    un-initialized warmup (eps0 anchored at 0.02) wedged all-rejecting."""
    _, _, logprob, _, _ = pendulum_posterior
    _, _, mean, std = quad_truth
    rng = np.random.default_rng(3)
    x0 = np.asarray([0.0, 0.0, 0.7])
    x0s = jnp.asarray(x0[None] + 0.05 * rng.standard_normal((4, 3)))
    r = hmc.sample_hmc(logprob, x0s, 600, n_warmup=300, step_size=0.02,
                       n_leapfrog=24, seed=2, adapt_step_size=True)
    assert float(np.min(np.asarray(r.accept_rate))) > 0.4
    s = np.asarray(r.samples).reshape(-1, 3)
    tol = 3.0 * np.maximum(_mc_err(s), 1e-3)
    _assert_within(s.mean(0), mean, tol, "HMC posterior mean")
    np.testing.assert_allclose(s.std(0), std, rtol=0.35)


def test_marginalized_predictive_bands_agree(pendulum_posterior,
                                             nuts_chains, quad_truth):
    """E[mean], E[var] + Var[mean] over the hyperposterior: NUTS draws vs
    quadrature-weighted draws."""
    X, z, _, X_test, _ = pendulum_posterior
    G, w, _, _ = quad_truth
    V = X_test[:8]

    def marginal_bands(samples, k=40):
        means, varis = [], []
        for th in samples[:k]:
            hyp = 10.0 ** th
            m = SympGP.create(PER_SE, jnp.asarray(hyp[:2]),
                              jnp.asarray(hyp[2]), SIG2N, X, z)
            mu, var = predict.predict_df(m, V)
            means.append(np.asarray(mu))
            varis.append(np.asarray(var))
        means = np.stack(means)
        varis = np.stack(varis)
        # law of total variance: E[var] + Var[mean]
        return means.mean(0), varis.mean(0) + means.var(0)

    thin = nuts_chains[:: max(1, len(nuts_chains) // 40)]
    rng = np.random.default_rng(11)
    quad_draws = G[rng.choice(len(G), size=40, p=w)]
    mu_n, var_n = marginal_bands(thin)
    mu_q, var_q = marginal_bands(quad_draws)
    scale = float(np.std(np.asarray(z)))
    np.testing.assert_allclose(mu_n, mu_q, atol=0.05 * scale)
    # total predictive sigma bands within MC error of 40 draws
    np.testing.assert_allclose(np.sqrt(var_n), np.sqrt(var_q),
                               atol=0.1 * scale, rtol=0.5)


def test_variance_calibration_coverage(pendulum_posterior):
    """Point-fit ±2sigma band must cover ~95% of held-out map targets."""
    from sympgpr_tpu.gp.train import fit_sympgp

    X, z, _, X_test, z_test = pendulum_posterior
    sig = 2.0 * float(jnp.max(jnp.abs(z)) ** 2)
    sgp, _ = fit_sympgp(PER_SE, X, z, sig2n=SIG2N, x0=(-1.0, -1.0),
                        fixed_sig=sig, bounds=((-10, 1), (-10, 1)))
    mu, var = predict.predict_df(sgp, X_test)
    # targets are stacked (p - P | Q - q); predictions are (dF/dq, dF/dP)
    resid = np.asarray(mu).T.reshape(-1) - np.asarray(z_test)
    sd = np.sqrt(np.asarray(var).T.reshape(-1) + SIG2N)
    cover = float(np.mean(np.abs(resid) <= 2.0 * sd))
    # nominal 95%; binomial noise at 2n=60 plus smoothing bias tolerance
    assert cover >= 0.8, f"2-sigma coverage {cover:.2f} < 0.8"
    # the band must also be informative, not vacuous: some shrinkage
    assert float(np.median(sd)) < 0.5 * float(np.std(np.asarray(z_test)))