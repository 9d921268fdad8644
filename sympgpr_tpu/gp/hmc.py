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


def _kernel_one_chain(logprob, step_size, n_leapfrog):
    grad = jax.grad(logprob)

    def hmc_step(carry, key):
        x, lp = carry
        kmom, kacc = jax.random.split(key)
        p0 = jax.random.normal(kmom, x.shape, dtype=x.dtype)

        def leap(_, state):
            xx, pp = state
            pp = pp + 0.5 * step_size * grad(xx)
            xx = xx + step_size * pp
            pp = pp + 0.5 * step_size * grad(xx)
            return xx, pp

        x1, p1 = jax.lax.fori_loop(0, n_leapfrog, leap, (x, p0))
        lp1 = logprob(x1)
        # guard non-finite proposals
        lp1 = jnp.where(jnp.isfinite(lp1), lp1, -jnp.inf)
        log_alpha = (lp1 - 0.5 * p1 @ p1) - (lp - 0.5 * p0 @ p0)
        accept = jnp.log(jax.random.uniform(kacc, dtype=x.dtype)) < log_alpha
        x = jnp.where(accept, x1, x)
        lp = jnp.where(accept, lp1, lp)
        return (x, lp), (x, lp, accept)

    return hmc_step


@partial(jax.jit, static_argnames=("logprob", "n_samples", "n_warmup",
                                   "n_leapfrog"))
def sample_hmc(
    logprob: Callable[[Array], Array],
    x0s: Array,
    n_samples: int,
    *,
    n_warmup: int = 100,
    step_size: float = 0.05,
    n_leapfrog: int = 16,
    seed: int = 0,
) -> HMCResult:
    """Run HMC from (chains, dim) initial points; all chains vmapped."""
    chains, dim = x0s.shape
    step = _kernel_one_chain(logprob, step_size, n_leapfrog)

    def one_chain(x0, key):
        lp0 = logprob(x0)
        keys = jax.random.split(key, n_warmup + n_samples)
        (x, lp), (xs, lps, accs) = jax.lax.scan(step, (x0, lp0), keys)
        return (xs[n_warmup:], lps[n_warmup:],
                jnp.mean(accs[n_warmup:].astype(x0.dtype)))

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

    @partial(jax.shard_map, mesh=flat_mesh,
             in_specs=P("chains", None),
             out_specs=(P("chains", None, None), P("chains", None),
                        P("chains")),
             check_vma=False)
    def run(x0_shard):
        r = sample_hmc(logprob, x0_shard, n_samples, **kwargs)
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
