"""Iterative NUTS: bookkeeping equivalence vs recursion + posterior moments."""

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.distributed.sharded import make_mesh
from sympgpr_tpu.gp import hmc, likelihood, nuts
from sympgpr_tpu.gp.model import SympGP
from sympgpr_tpu.kernels import PER_SE


def _recursive_check_pairs(lo, hi):
    """All (left, right) leaf pairs the Hoffman-Gelman recursion U-turn
    checks inside a subtree spanning leaves [lo, hi] (size a power of 2)."""
    if hi == lo:
        return []
    mid = (lo + hi) // 2
    return (_recursive_check_pairs(lo, mid)
            + _recursive_check_pairs(mid + 1, hi)
            + [(lo, hi)])


def test_ckpt_bookkeeping_matches_recursion():
    """The iterative slot/range formulas must reproduce exactly the check
    pairs of the recursive tree, in a valid order (each left leaf still
    checkpointed when its checks fire)."""
    for depth in range(1, 6):
        L = 2 ** depth
        expected = sorted(_recursive_check_pairs(1, L))
        slots = {}
        got = []
        for n in range(1, L + 1):
            na = jnp.asarray(n, jnp.int32)
            if n % 2 == 1:
                slots[int(nuts._store_slot(na))] = n
            else:
                lo, hi = nuts._check_range(na)
                for k in range(int(lo), int(hi) + 1):
                    assert k in slots, (depth, n, k, slots)
                    got.append((slots[k], n))
        assert sorted(got) == expected, depth


def test_nuts_samples_gaussian():
    """NUTS on a known anisotropic 2-D Gaussian: moments must match."""

    def logprob(x):
        return -0.5 * (x[0] ** 2 / 1.0 + x[1] ** 2 / 4.0)

    x0s = jnp.zeros((4, 2)) + jnp.asarray([[0.1], [-0.1], [0.2], [-0.2]])
    res = nuts.sample_nuts(logprob, x0s, 800, n_warmup=300, step_size=0.2,
                           max_depth=6, seed=0)
    s = np.asarray(res.samples).reshape(-1, 2)
    assert float(res.accept_stat.min()) > 0.5
    assert int(res.n_divergent.sum()) == 0
    # trees must actually grow (not terminate at depth 0 every step)
    assert float(res.mean_depth.mean()) > 1.0
    np.testing.assert_allclose(s.mean(0), [0, 0], atol=0.15)
    np.testing.assert_allclose(s.var(0), [1.0, 4.0], rtol=0.2)


def test_nuts_correlated_gaussian():
    """Strong correlation: NUTS's adaptive trajectory length must recover
    the covariance a short fixed-length sampler struggles with."""
    rho = 0.9
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]]))
    pj = jnp.asarray(prec)

    def logprob(x):
        return -0.5 * x @ pj @ x

    x0s = jnp.asarray(np.random.default_rng(1).normal(size=(6, 2)) * 0.1)
    res = nuts.sample_nuts(logprob, x0s, 1200, n_warmup=400, step_size=0.2,
                           max_depth=8, seed=1)
    s = np.asarray(res.samples).reshape(-1, 2)
    cov = np.cov(s.T)
    np.testing.assert_allclose(cov, [[1.0, rho], [rho, 1.0]], atol=0.15)


def test_nuts_over_gp_hyperparameters():
    rng = np.random.default_rng(0)
    n = 10
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, P], 1))
    z = jnp.asarray(np.concatenate([0.2 * np.sin(q), 0.1 * np.cos(q) * P]))
    SympGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-8, X, z)
    logprob = hmc.nll_logprob(PER_SE, X, z, 1e-8, likelihood.nll)
    x0s = jnp.zeros((2, 3)) + jnp.asarray([[0.0], [0.2]])
    res = nuts.sample_nuts(logprob, x0s, 60, n_warmup=60, step_size=0.02,
                           max_depth=6, seed=1)
    assert np.isfinite(np.asarray(res.log_probs)).all()
    assert float(res.accept_stat.min()) > 0.2

    # posterior center agrees with HMC on the same target for the
    # identified components (lx, ly); sigma is weakly identified at n=10
    # and its short-chain means differ by design
    res_h = hmc.sample_hmc(logprob, x0s, 200, n_warmup=200, step_size=0.02,
                           n_leapfrog=16, seed=2, adapt_step_size=True)
    m_n = np.asarray(res.samples).reshape(-1, 3).mean(0)
    m_h = np.asarray(res_h.samples).reshape(-1, 3).mean(0)
    np.testing.assert_allclose(m_n[:2], m_h[:2], atol=0.6)


def test_nuts_sharded_runs():
    mesh = make_mesh(jax.devices()[:8])

    def logprob(x):
        return -0.5 * jnp.sum(x**2)

    x0s = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)))
    res = nuts.sample_nuts_sharded(logprob, x0s, mesh, 100, n_warmup=50,
                                   step_size=0.3, max_depth=6)
    assert res.samples.shape == (8, 100, 2)
    assert np.isfinite(np.asarray(res.samples)).all()


def test_nuts_sharded_shards_draw_distinct_streams():
    # regression: with a shared per-shard seed, chain i on device 0 and
    # chain i on device 1 drew identical momenta/directions and produced
    # identical (or tightly coupled) sample paths from equal starts.
    mesh = make_mesh(jax.devices()[:8])

    def logprob(x):
        return -0.5 * jnp.sum(x**2)

    x0s = jnp.zeros((8, 2))  # identical starts: only the RNG can differ
    res = nuts.sample_nuts_sharded(logprob, x0s, mesh, 50, n_warmup=10,
                                   step_size=0.3, max_depth=5,
                                   adapt_step_size=False)
    s = np.asarray(res.samples)  # (8 chains = 1/device, 50, 2)
    for i in range(1, 8):
        assert not np.allclose(s[0], s[i]), f"chains 0 and {i} identical"
