"""Quality metrics — the acceptance criteria of every reference workload.

Mirrors ``quality``/``energy`` (``python/functions/func.py:262-272``,
``python/01_pendulum/implicit/main.py:23-24``): energy oscillation
``Eosc = std(H)/mean(H)`` per orbit and geometric distance
``gd = MSE((Q1,P1)_GP, reference orbit at the map time)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def energy_oscillation(H: Array, axis: int = 0) -> Array:
    """std(H)/mean(H) along the time axis; NaN-lost samples ignored."""
    return jnp.nanstd(H, axis=axis) / jnp.nanmean(H, axis=axis)


def geometric_distance(
    q1: Array, p1: Array, q_ref: Array, p_ref: Array,
    mod_q: float | None = None,
) -> tuple[Array, Array]:
    """Per-orbit MSE of the first mapped point vs the reference orbit.

    Reference: ``gd[lk] = mean_squared_error([qmap[1,lk], pmap[1,lk]],
    ysint[Nm,:,lk])`` (``python/01_pendulum/implicit/func.py:187-192``).
    The reference takes the raw angle difference, which spuriously inflates
    gd for orbits that land just across the 0/2pi seam; ``mod_q`` enables
    a proper minimum-image angle difference (off by default for parity).
    Returns (gd per orbit, std over orbits).
    """
    dq = q1 - q_ref
    if mod_q is not None:
        dq = dq - jnp.round(dq / mod_q) * mod_q
    gd = 0.5 * (dq**2 + (p1 - p_ref) ** 2)
    return gd, jnp.std(gd)


def training_mse(z: Array, z_pred: Array) -> Array:
    return jnp.mean((z - z_pred) ** 2)


def pendulum_energy(q: Array, p: Array, U0: float = 1.0) -> Array:
    """H = p^2/2 + U0 (1 - cos(q + pi)) (``python/01_pendulum/implicit/
    main.py:23-24``)."""
    return p**2 / 2.0 + U0 * (1.0 - jnp.cos(q + jnp.pi))


def henon_energy(x: Array, lam: float = 1.0) -> Array:
    """Henon-Heiles Hamiltonian on full 4-D state (q1, q2, p1, p2)
    (``python/03_henon_heiles/main.py:31-33``)."""
    q1, q2, p1, p2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return (
        0.5 * (p1**2 + p2**2)
        + 0.5 * (q1**2 + q2**2)
        + lam * (q1**2 * q2 - q2**3 / 3.0)
    )
