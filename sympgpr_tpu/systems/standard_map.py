"""Chirikov standard map (workload 04) — exact iteration, batched.

Reference: ``StandardMap``/``StandardMapIterate``
(``python/04_standard_map/main.py:27-44``): J' = J + k sin(th), th' = th + J'.
Pure JAX `lax.scan`, vmapped over orbits (the reference double-loops in
Python).
"""

from __future__ import annotations

import dataclasses
import random as _pyrandom

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.systems.halton import halton

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class StandardMapConfig:
    """Constants of ``python/04_standard_map/main.py:21-25``."""

    k: float = 2.0
    N: int = 20
    nm: int = 100
    Ntest: int = 30
    sig2_n: float = 1e-12


def iterate(q0: Array, p0: Array, k: float, n_steps: int):
    """(n_steps+1, B) trajectories of the exact map (unwrapped)."""
    q0 = jnp.atleast_1d(q0)
    p0 = jnp.atleast_1d(p0)

    def step(carry, _):
        q, p = carry
        p = p + k * jnp.sin(q)
        q = q + p
        return (q, p), (q, p)

    _, (qs, ps) = jax.lax.scan(step, (q0, p0), None, length=n_steps)
    return (
        jnp.concatenate([q0[None], qs]),
        jnp.concatenate([p0[None], ps]),
    )


def training_data(cfg: StandardMapConfig = StandardMapConfig()):
    """One exact map application from Halton ICs (``main.py:42-59``)."""
    X0 = halton(cfg.N, 2) * 2.0 * np.pi
    q, p = X0[:, 0], X0[:, 1]
    qs, ps = iterate(q, p, cfg.k, 1)
    Q, P = np.asarray(qs[1]), np.asarray(ps[1])
    X = np.stack([q, P], axis=1)
    z = np.concatenate([p - P, Q - q])
    Xp = np.stack([q, p], axis=1)
    zp = P - p  # delta-style aux targets (``main.py:90``)
    return dict(X=X, z=z, Xp=Xp, zp=zp, q=q, p=p, Q=Q, P=P)


def test_initial_conditions(cfg: StandardMapConfig = StandardMapConfig()):
    """``random.seed(0); random.sample(linspace, Ntest)`` (``main.py:68-74``)."""
    rng = _pyrandom.Random()
    rng.seed(0)
    q0 = np.linspace(0.0, 2.0 * np.pi, cfg.Ntest)
    p0 = np.linspace(0.0, 2.0 * np.pi, cfg.Ntest)
    q0 = np.array(rng.sample(list(q0), cfg.Ntest))
    p0 = np.array(rng.sample(list(p0), cfg.Ntest))
    return q0, p0
