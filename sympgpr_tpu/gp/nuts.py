"""No-U-Turn Sampler over GP hyperparameters (iterative, jit-friendly).

Completes the north-star sampling capability next to ``gp/hmc.py``
(BASELINE.json: "NUTS/HMC over (l, sigma) sharded across chains") — the
reference only point-estimates with L-BFGS/CMA-ES.

This is the *iterative* formulation of multinomial NUTS: the recursive
tree doubling of Hoffman & Gelman (2014) is replaced by two nested
``lax.while_loop``s (doublings outside, leapfrog steps inside) plus a
checkpoint buffer of size ``max_depth + 1`` that reproduces exactly the
U-turn checks the recursion would make — recursion is not traceable under
``jit``, buffers are.  Trajectory-internal states are never materialized;
per chain the working set is O(max_depth * dim), so thousands of chains
vmap/shard cleanly.

Checkpoint bookkeeping (derived in closed form; validated against a
recursive enumeration in ``tests/test_nuts.py``): number subtree leaves
1..2^d in generation order.  Leaf n odd is the left edge of one or more
dyadic blocks and is stored at slot ``popcount(n-1)``; leaf n even closes
the blocks ``[n-2^j+1, n]`` for j = 1..ctz(n), whose left edges sit at the
contiguous slot range ``[popcount(n)-1, popcount(n)+ctz(n)-2]``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Array = jax.Array

_DIVERGENCE = 1000.0  # energy-error divergence threshold (Stan's default)


class NUTSResult(NamedTuple):
    samples: Array       # (chains, n_samples, dim)
    log_probs: Array     # (chains, n_samples)
    accept_stat: Array   # (chains,) mean Metropolis accept statistic
    mean_depth: Array    # (chains,) mean terminal tree depth
    n_divergent: Array   # (chains,) divergent transitions in sampling phase


def _popcount(n):
    return jax.lax.population_count(n)


def _ctz(n):
    """Count of trailing zero bits (n > 0)."""
    return _popcount(jnp.bitwise_and(n, -n) - 1)


def _store_slot(n):
    """Checkpoint slot for odd leaf n (1-indexed within its subtree)."""
    return _popcount(n - 1)


def _check_range(n):
    """(idx_min, idx_max) of checkpoint slots U-turn-checked against even
    leaf n; empty unless n is even (idx_max < idx_min never happens for
    even n >= 2)."""
    lo = _popcount(n) - 1
    return lo, lo + _ctz(n) - 1


def _uturn(dx, r_a, r_b):
    """Generalized U-turn criterion on the segment a -> b (integration
    order): either end's momentum points back across the segment."""
    return (jnp.dot(dx, r_a) < 0.0) | (jnp.dot(dx, r_b) < 0.0)


def _kernel_one_chain(logprob, max_depth):
    grad = jax.grad(logprob)

    def leapfrog(x, r, eps):
        r = r + 0.5 * eps * grad(x)
        x = x + eps * r
        r = r + 0.5 * eps * grad(x)
        return x, r

    def nuts_step(carry, key):
        x0, lp0, eps = carry
        dim = x0.shape[0]
        kmom, kdir, ktree = jax.random.split(key, 3)
        r0 = jax.random.normal(kmom, x0.shape, dtype=x0.dtype)
        H0 = lp0 - 0.5 * (r0 @ r0)
        dirs = jax.random.rademacher(
            kdir, (max_depth,), dtype=jnp.int32).astype(x0.dtype)

        # ends in the *global* time frame: momenta point in +time direction
        zero = jnp.zeros((), x0.dtype)
        neg_inf = jnp.asarray(-jnp.inf, x0.dtype)
        state = dict(
            x_l=x0, r_l=r0, x_r=x0, r_r=r0,
            x_prop=x0, lp_prop=lp0,
            logW=zero,                       # leaf 0 has relative weight 1
            sum_alpha=zero, n_alpha=zero,
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            depth=jnp.asarray(0, jnp.int32),
        )

        def subtree(depth, direction, s):
            """Integrate 2^depth new leaves from the moving end."""
            L = jnp.asarray(1, jnp.int32) << depth
            # integration frame: always step forward with eps, momentum
            # flipped so that backward extension is forward dynamics
            x_end = jnp.where(direction > 0, s["x_r"], s["x_l"])
            r_end = jnp.where(direction > 0, s["r_r"], s["r_l"]) * direction
            ck_x = jnp.zeros((max_depth + 1, dim), x0.dtype)
            ck_r = jnp.zeros((max_depth + 1, dim), x0.dtype)
            sub = dict(
                i=jnp.asarray(1, jnp.int32), x=x_end, r=r_end,
                x_sub=x_end, lp_sub=s["lp_prop"], logW=neg_inf,
                sum_alpha=zero, n_alpha=zero,
                turning=jnp.asarray(False), diverging=jnp.asarray(False),
                ck_x=ck_x, ck_r=ck_r,
            )

            def cond(t):
                return (t["i"] <= L) & ~t["turning"] & ~t["diverging"]

            def body(t):
                n = t["i"]
                x, r = leapfrog(t["x"], t["r"], eps)
                lp = logprob(x)
                dH = (lp - 0.5 * (r @ r)) - H0
                dH = jnp.where(jnp.isfinite(dH), dH, -jnp.inf)
                diverging = dH < -_DIVERGENCE
                # progressive multinomial sampling within the subtree.
                # fold in a *globally unique* leaf id: the depth-d subtree
                # numbers its leaves n = 1..L (L = 2^d), so L + n covers
                # the disjoint range [2^d + 1, 2^(d+1)] — leaves of
                # different doublings never share a uniform (negative ids
                # remain reserved for the across-doubling accept draws).
                new_logW = jnp.logaddexp(t["logW"], dH)
                u = jax.random.uniform(
                    jax.random.fold_in(ktree, L + n), dtype=x0.dtype)
                take = jnp.log(u) < dH - new_logW
                x_sub = jnp.where(take, x, t["x_sub"])
                lp_sub = jnp.where(take, lp, t["lp_sub"])
                # checkpoint store (odd leaves) / U-turn checks (even)
                odd = (n & 1) == 1
                slot = _store_slot(n)
                ck_x = jnp.where(odd, t["ck_x"].at[slot].set(x), t["ck_x"])
                ck_r = jnp.where(odd, t["ck_r"].at[slot].set(r), t["ck_r"])
                lo, hi = _check_range(n)
                idx = jnp.arange(max_depth + 1)
                mask = (~odd) & (idx >= lo) & (idx <= hi)
                turns = jax.vmap(
                    lambda xa, ra: _uturn(x - xa, ra, r))(ck_x, ck_r)
                turning = jnp.any(turns & mask)
                alpha = jnp.minimum(1.0, jnp.exp(dH))
                return dict(
                    i=n + 1, x=x, r=r, x_sub=x_sub, lp_sub=lp_sub,
                    logW=new_logW, sum_alpha=t["sum_alpha"] + alpha,
                    n_alpha=t["n_alpha"] + 1.0,
                    turning=turning, diverging=diverging,
                    ck_x=ck_x, ck_r=ck_r,
                )

            return jax.lax.while_loop(cond, body, sub)

        def cond(s):
            return ((s["depth"] < max_depth)
                    & ~s["turning"] & ~s["diverging"])

        def body(s):
            direction = dirs[s["depth"]]
            t = subtree(s["depth"], direction, s)
            ok = ~t["turning"] & ~t["diverging"]
            # biased progressive sampling across the doubling
            u = jax.random.uniform(
                jax.random.fold_in(ktree, -1 - s["depth"]), dtype=x0.dtype)
            take = ok & (jnp.log(u) < t["logW"] - s["logW"])
            x_prop = jnp.where(take, t["x_sub"], s["x_prop"])
            lp_prop = jnp.where(take, t["lp_sub"], s["lp_prop"])
            logW = jnp.where(ok, jnp.logaddexp(s["logW"], t["logW"]),
                             s["logW"])
            # move the extended end (back to the global frame)
            fwd = direction > 0
            upd = lambda old, new: jnp.where(ok, jnp.where(fwd, new, old),
                                             old)
            x_r = upd(s["x_r"], t["x"])
            r_r = upd(s["r_r"], t["r"] * direction)
            upd_b = lambda old, new: jnp.where(ok, jnp.where(fwd, old, new),
                                               old)
            x_l = upd_b(s["x_l"], t["x"])
            r_l = upd_b(s["r_l"], t["r"] * direction)
            turning = t["turning"] | (
                ok & _uturn(x_r - x_l, r_l, r_r))
            return dict(
                x_l=x_l, r_l=r_l, x_r=x_r, r_r=r_r,
                x_prop=x_prop, lp_prop=lp_prop, logW=logW,
                sum_alpha=s["sum_alpha"] + t["sum_alpha"],
                n_alpha=s["n_alpha"] + t["n_alpha"],
                turning=turning, diverging=t["diverging"],
                depth=s["depth"] + 1,
            )

        s = jax.lax.while_loop(cond, body, state)
        alpha_mean = s["sum_alpha"] / jnp.maximum(s["n_alpha"], 1.0)
        out = (s["x_prop"], s["lp_prop"], alpha_mean,
               s["depth"].astype(x0.dtype), s["diverging"])
        return (s["x_prop"], s["lp_prop"], eps), out

    return nuts_step


@partial(jax.jit, static_argnames=("logprob", "n_samples", "n_warmup",
                                   "max_depth", "adapt_step_size"))
def sample_nuts(
    logprob: Callable[[Array], Array],
    x0s: Array,
    n_samples: int,
    *,
    n_warmup: int = 200,
    step_size: float = 0.05,
    max_depth: int = 8,
    seed: int = 0,
    adapt_step_size: bool = True,
    target_accept: float = 0.8,
) -> NUTSResult:
    """Run NUTS from (chains, dim) initial points; all chains vmapped.

    Warmup tunes the step size per chain by dual averaging (Hoffman &
    Gelman 2014, Algorithm 5) on the trajectory-mean accept statistic;
    sampling runs at the averaged step size.
    """
    chains, dim = x0s.shape
    step = _kernel_one_chain(logprob, max_depth)

    def one_chain(x0, key):
        lp0 = logprob(x0)
        kinit, key = jax.random.split(key)
        keys = jax.random.split(key, n_warmup + n_samples)
        eps0 = jnp.asarray(step_size, x0.dtype)

        if adapt_step_size and n_warmup > 0:
            from sympgpr_tpu.gp.hmc import find_reasonable_eps

            eps0 = find_reasonable_eps(logprob, x0, lp0, kinit, eps0)
            mu = jnp.log(10.0 * eps0)
            gamma, t0c, kappa = 0.05, 10.0, 0.75

            def warm_body(carry, key):
                state, log_eps_bar, h_bar, t = carry
                state, (_, _, alpha, _, _) = step(state, key)
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

        _, (xs, lps, alphas, depths, divs) = jax.lax.scan(
            step, (x, lp, eps), keys[n_warmup:])
        return (xs, lps, jnp.mean(alphas), jnp.mean(depths),
                jnp.sum(divs.astype(jnp.int32)))

    keys = jax.random.split(jax.random.PRNGKey(seed), chains)
    xs, lps, acc, dep, ndiv = jax.vmap(one_chain)(x0s, keys)
    return NUTSResult(xs, lps, acc, dep, ndiv)


def sample_nuts_sharded(
    logprob: Callable[[Array], Array],
    x0s: Array,
    mesh: Mesh,
    n_samples: int,
    **kwargs,
) -> NUTSResult:
    """Chains sharded over all mesh devices (flattened to one axis);
    zero cross-device communication except the final gather."""
    n_dev = mesh.devices.size
    assert x0s.shape[0] % n_dev == 0, "chains must divide device count"
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("chains",))
    seed = int(kwargs.pop("seed", 0))

    @partial(jax.shard_map, mesh=flat_mesh,
             in_specs=P("chains", None),
             out_specs=(P("chains", None, None), P("chains", None),
                        P("chains"), P("chains"), P("chains")),
             check_vma=False)
    def run(x0_shard):
        # each shard must draw from a distinct PRNG stream: a shared seed
        # would give chain i on every device identical momenta/directions
        # (common random numbers -> coupled, coalescing chains).
        shard_seed = seed * n_dev + jax.lax.axis_index("chains")
        return tuple(sample_nuts(logprob, x0_shard, n_samples,
                                 seed=shard_seed, **kwargs))

    return NUTSResult(*run(x0s))
