"""HMC over GP hyperparameters, vmapped and chain-parallel.

North-star capability (BASELINE.json: "hyperparameters inferred by gradient
NLML optimization plus NUTS/HMC over (l, sigma) sharded across chains") —
absent in the reference, which only point-estimates with L-BFGS/CMA-ES.

Standard HMC with a fixed leapfrog integrator; all chains advance together
under `vmap` (one fused program per iteration), and chains can additionally
be sharded across mesh devices with `sample_hmc_sharded` — each device then
owns chains/n_dev chains and there is zero cross-device communication except
the final gather.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Array = jax.Array


class HMCResult(NamedTuple):
    samples: Array       # (chains, n_samples, dim)
    log_probs: Array     # (chains, n_samples)
    accept_rate: Array   # (chains,)


def _kernel_one_chain(logprob, n_leapfrog):
    grad = jax.grad(logprob)

    def hmc_step(carry, key):
        """One HMC transition; step size carried (dual-averaging warmup)."""
        x, lp, eps = carry
        kmom, kacc = jax.random.split(key)
        p0 = jax.random.normal(kmom, x.shape, dtype=x.dtype)

        def leap(_, state):
            xx, pp = state
            pp = pp + 0.5 * eps * grad(xx)
            xx = xx + eps * pp
            pp = pp + 0.5 * eps * grad(xx)
            return xx, pp

        x1, p1 = jax.lax.fori_loop(0, n_leapfrog, leap, (x, p0))
        lp1 = logprob(x1)
        # guard non-finite proposals; a divergent leapfrog yields NaN
        # momenta, and log_alpha = -inf - NaN = NaN would poison the
        # dual-averaging state (h_bar -> NaN -> eps NaN -> chain frozen
        # all-rejecting) — map any NaN energy difference to certain reject
        lp1 = jnp.where(jnp.isfinite(lp1), lp1, -jnp.inf)
        log_alpha = (lp1 - 0.5 * p1 @ p1) - (lp - 0.5 * p0 @ p0)
        log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
        accept = jnp.log(jax.random.uniform(kacc, dtype=x.dtype)) < log_alpha
        alpha = jnp.minimum(1.0, jnp.exp(log_alpha))
        x = jnp.where(accept, x1, x)
        lp = jnp.where(accept, lp1, lp)
        return (x, lp, eps), (x, lp, accept, alpha)

    return hmc_step


def find_reasonable_eps(logprob, x0, lp0, key, eps0):
    """Stan-style step-size initialization (Hoffman & Gelman 2014, Alg 4).

    Doubles/halves eps until the one-step leapfrog accept ratio crosses
    1/2, so dual averaging starts near a workable scale.  Without this,
    a fixed eps0 far from the posterior's curvature scale can wedge the
    warmup on cliffy GP hyperposteriors (observed: all-reject chains on
    the pendulum NLL at eps0=0.02) — the mu = log(10 eps) anchor then
    fights the adaptation instead of guiding it.
    """
    grad = jax.grad(logprob)

    def log_ratio(eps, r0):
        r = r0 + 0.5 * eps * grad(x0)
        x1 = x0 + eps * r
        r = r + 0.5 * eps * grad(x1)
        lp1 = logprob(x1)
        lp1 = jnp.where(jnp.isfinite(lp1), lp1, -jnp.inf)
        la = (lp1 - 0.5 * r @ r) - (lp0 - 0.5 * r0 @ r0)
        return jnp.where(jnp.isnan(la), -jnp.inf, la)

    r0 = jax.random.normal(key, x0.shape, dtype=x0.dtype)
    la0 = log_ratio(eps0, r0)
    log2 = jnp.asarray(np.log(2.0), x0.dtype)
    d = jnp.where(la0 > -log2, 1.0, -1.0)

    def cond(c):
        eps, la, it = c
        return (d * la > -d * log2) & (it < 40)

    def body(c):
        eps, _, it = c
        eps = eps * jnp.exp2(d)
        return eps, log_ratio(eps, r0), it + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps0, la0, 0))
    return eps


@partial(jax.jit, static_argnames=("logprob", "n_samples", "n_warmup",
                                   "n_leapfrog", "adapt_step_size"))
def sample_hmc(
    logprob: Callable[[Array], Array],
    x0s: Array,
    n_samples: int,
    *,
    n_warmup: int = 100,
    step_size: float = 0.05,
    n_leapfrog: int = 16,
    seed: int = 0,
    adapt_step_size: bool = False,
    target_accept: float = 0.8,
) -> HMCResult:
    """Run HMC from (chains, dim) initial points; all chains vmapped.

    With ``adapt_step_size`` the warmup phase tunes the step size per chain
    by dual averaging (Hoffman & Gelman 2014, Algorithm 5) toward
    ``target_accept``; sampling then runs at the averaged step size.
    """
    chains, dim = x0s.shape
    step = _kernel_one_chain(logprob, n_leapfrog)

    def one_chain(x0, key):
        lp0 = logprob(x0)
        kinit, key = jax.random.split(key)
        keys = jax.random.split(key, n_warmup + n_samples)
        eps0 = jnp.asarray(step_size, x0.dtype)

        if adapt_step_size and n_warmup > 0:
            eps0 = find_reasonable_eps(logprob, x0, lp0, kinit, eps0)
            mu = jnp.log(10.0 * eps0)
            gamma, t0c, kappa = 0.05, 10.0, 0.75

            def warm_body(carry, key):
                state, log_eps_bar, h_bar, t = carry
                state, (_, _, _, alpha) = step(state, key)
                x, lp, _ = state
                h_bar = (1 - 1 / (t + t0c)) * h_bar + (
                    (target_accept - alpha) / (t + t0c))
                log_eps = mu - jnp.sqrt(t) / gamma * h_bar
                w = t ** (-kappa)
                log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
                return ((x, lp, jnp.exp(log_eps)), log_eps_bar, h_bar,
                        t + 1.0), None

            init = ((x0, lp0, eps0), jnp.log(eps0),
                    jnp.asarray(0.0, x0.dtype), jnp.asarray(1.0, x0.dtype))
            (state, log_eps_bar, _, _), _ = jax.lax.scan(
                warm_body, init, keys[:n_warmup])
            x, lp, _ = state
            eps = jnp.exp(log_eps_bar)
        else:
            state = (x0, lp0, eps0)
            if n_warmup > 0:
                state, _ = jax.lax.scan(step, state, keys[:n_warmup])
            x, lp, eps = state

        _, (xs, lps, accs, _) = jax.lax.scan(step, (x, lp, eps),
                                             keys[n_warmup:])
        return xs, lps, jnp.mean(accs.astype(x0.dtype))

    keys = jax.random.split(jax.random.PRNGKey(seed), chains)
    xs, lps, acc = jax.vmap(one_chain)(x0s, keys)
    return HMCResult(xs, lps, acc)


def sample_hmc_sharded(
    logprob: Callable[[Array], Array],
    x0s: Array,
    mesh: Mesh,
    n_samples: int,
    **kwargs,
) -> HMCResult:
    """Chains sharded over all mesh devices (flattened to one axis)."""
    n_dev = mesh.devices.size
    assert x0s.shape[0] % n_dev == 0, "chains must divide device count"
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("chains",))
    seed = int(kwargs.pop("seed", 0))

    @partial(jax.shard_map, mesh=flat_mesh,
             in_specs=P("chains", None),
             out_specs=(P("chains", None, None), P("chains", None),
                        P("chains")),
             check_vma=False)
    def run(x0_shard):
        # distinct PRNG stream per shard — a shared seed would couple the
        # nominally independent chains via common random numbers.
        shard_seed = seed * n_dev + jax.lax.axis_index("chains")
        r = sample_hmc(logprob, x0_shard, n_samples, seed=shard_seed,
                       **kwargs)
        return r.samples, r.log_probs, r.accept_rate

    return HMCResult(*run(x0s))


def nll_logprob(kernel, X, z, sig2n, nll_fn, scale: float = 1.0):
    """log p(theta) = -NLL(10^theta) with a broad Gaussian prior on theta
    (log10 hyperparameters)."""

    def logprob(theta):
        hyp = 10.0 ** theta
        nll = nll_fn(kernel, hyp[:-1], hyp[-1],
                     jnp.asarray(sig2n, theta.dtype), X, z)
        prior = -0.5 * jnp.sum((theta / 3.0) ** 2)
        val = -nll * scale + prior
        return jnp.where(jnp.isfinite(val), val, -jnp.inf)

    return logprob
