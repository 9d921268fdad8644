"""Henon-Heiles system (workload 03): event-detected Poincare sections.

Reference: ``python/03_henon_heiles/henon.f90`` + vendored DVODE (19k lines of
Fortran) — integrates ``z = (q1, q2, p1, p2)`` with
``dq/dt = w p, dp1/dt = -w1 q1 - 2 lam q1 q2,
dp2/dt = -w2 q2 - lam (q1^2 - q2^2)`` and records roots of ``q1 == 0`` with
``p1 > 0`` (rising Poincare cuts), rtol 1e-12.

TPU-native replacement (no DVODE port): batched fixed-step RK4 under
`lax.scan`; rising zero crossings of q1 detected per step; each crossing is
localized by Newton on the *fractional RK4 step* theta in (0, dt] solving
``q1(rk4(z_prev, theta)) = 0`` (derivative dq1/dtheta = w1 p1 known
analytically), which keeps full RK4 accuracy at the section point.  Cuts are
scatter-collected on device into a static (max_cuts, B, 4) buffer.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.systems.halton import halton

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HenonConfig:
    """Constants of ``python/03_henon_heiles/main.py:23-26,29-30`` and
    ``henon_mod.f90`` (w1 = w2 = 1)."""

    N: int = 55
    nm: int = 500
    Ntest: int = 37
    sig2_n: float = 1e-12
    lam: float = 1.0
    E_bound: float = 0.01
    w1: float = 1.0
    w2: float = 1.0
    dt: float = 0.01
    scale: float = 1e2  # section coordinates scaled by 1e2 (main.py:91-94)


def rhs(z: Array, lam: float, w1: float, w2: float) -> Array:
    q1, q2, p1, p2 = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    return jnp.stack(
        [
            w1 * p1,
            w2 * p2,
            -w1 * q1 - 2.0 * lam * q1 * q2,
            -w2 * q2 - lam * (q1**2 - q2**2),
        ],
        axis=-1,
    )


def _rk4(z, dt, lam, w1, w2):
    k1 = rhs(z, lam, w1, w2)
    k2 = rhs(z + 0.5 * dt * k1, lam, w1, w2)
    k3 = rhs(z + 0.5 * dt * k2, lam, w1, w2)
    k4 = rhs(z + dt * k3, lam, w1, w2)
    return z + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _polish_crossing(z_prev, dt, lam, w1, w2, iters: int = 6):
    """Newton on the fractional step length: q1(rk4(z_prev, theta)) = 0."""
    q1a = z_prev[..., 0]
    z_next = _rk4(z_prev, dt, lam, w1, w2)
    q1b = z_next[..., 0]
    theta = dt * q1a / (q1a - q1b)  # secant init
    theta = jnp.clip(jnp.nan_to_num(theta, nan=0.5 * dt), 0.0, dt)

    def body(_, theta):
        zt = _rk4_scaled(z_prev, theta, lam, w1, w2)
        f = zt[..., 0]
        fp = w1 * zt[..., 2]  # dq1/dtheta = w1 p1
        step = f / jnp.where(jnp.abs(fp) > 1e-30, fp, 1e-30)
        return jnp.clip(theta - step, 0.0, dt)

    theta = jax.lax.fori_loop(0, iters, body, theta)
    return _rk4_scaled(z_prev, theta, lam, w1, w2), theta


def _rk4_scaled(z, theta, lam, w1, w2):
    """RK4 step with per-sample step size theta (B,) on states (B, 4)."""
    th = theta[..., None]
    k1 = rhs(z, lam, w1, w2)
    k2 = rhs(z + 0.5 * th * k1, lam, w1, w2)
    k3 = rhs(z + 0.5 * th * k2, lam, w1, w2)
    k4 = rhs(z + th * k3, lam, w1, w2)
    return z + (th / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "max_cuts"))
def integrate_sections(
    cfg: HenonConfig, z0: Array, n_steps: int, max_cuts: int
):
    """Integrate (B, 4) states; collect rising q1=0 cuts.

    Returns (cuts (max_cuts, B, 4), tcuts (max_cuts, B), counts (B,)).
    Unfilled slots are NaN.
    """
    B = z0.shape[0]
    lam, w1, w2, dt = cfg.lam, cfg.w1, cfg.w2, cfg.dt
    cuts0 = jnp.full((max_cuts, B, 4), jnp.nan, dtype=z0.dtype)
    tcuts0 = jnp.full((max_cuts, B), jnp.nan, dtype=z0.dtype)

    def step(carry, i):
        z, cuts, tcuts, count = carry
        z_new = _rk4(z, dt, lam, w1, w2)
        crossed = (z[..., 0] < 0.0) & (z_new[..., 0] >= 0.0)
        z_cut, theta = _polish_crossing(z, dt, lam, w1, w2)
        slot = jnp.minimum(count, max_cuts - 1)
        write = crossed & (count < max_cuts)
        b_idx = jnp.arange(B)
        cuts = cuts.at[slot, b_idx].set(
            jnp.where(write[:, None], z_cut, cuts[slot, b_idx])
        )
        tcuts = tcuts.at[slot, b_idx].set(
            jnp.where(write, i * dt + theta, tcuts[slot, b_idx])
        )
        count = count + write.astype(count.dtype)
        return (z_new, cuts, tcuts, count), None

    (z, cuts, tcuts, count), _ = jax.lax.scan(
        step, (z0, cuts0, tcuts0, jnp.zeros(B, jnp.int32)),
        jnp.arange(n_steps),
    )
    return cuts, tcuts, count


def energy(z: Array, lam: float) -> Array:
    q1, q2, p1, p2 = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    return (
        0.5 * (p1**2 + p2**2)
        + 0.5 * (q1**2 + q2**2)
        + lam * (q1**2 * q2 - q2**3 / 3.0)
    )


def _ebound(q2, p2, lam):
    """Section-energy bound used to filter ICs (``main.py:34-36``)."""
    return 0.5 * p2**2 + 0.5 * q2**2 - lam * q2**3 / 3.0


def _qdot(q2, p2, lam, E_bound):
    """p1 on the section from energy conservation (``main.py:37-38``)."""
    return np.sqrt(2 * E_bound - p2**2 - q2**2 + lam * 2.0 / 3.0 * q2**3)


def training_ics(cfg: HenonConfig = HenonConfig()) -> np.ndarray:
    """Halton (q2, p2) in [-0.15, 0.15]^2 filtered by the energy bound,
    completed to (0, q2, p1, p2) on the section (``main.py:40-51``)."""
    samples_all = halton(2 * cfg.N, 2) * 0.3 - 0.15
    keep = _ebound(samples_all[:, 0], samples_all[:, 1], cfg.lam) < cfg.E_bound
    samples = samples_all[keep][: cfg.N]
    q2, p2 = samples[:, 0], samples[:, 1]
    p1 = _qdot(q2, p2, cfg.lam, cfg.E_bound)
    return np.stack([np.zeros(len(q2)), q2, p1, p2], axis=1)


def test_ics(cfg: HenonConfig = HenonConfig()) -> np.ndarray:
    """Seeded sampled linspaces in [-0.1, 0.1] (``main.py:108-118``)."""
    import random as _pyrandom

    rng = _pyrandom.Random()
    rng.seed(1)
    q0 = np.linspace(-0.1, 0.1, cfg.Ntest)
    q0 = np.array(rng.sample(list(q0), cfg.Ntest))
    rng2 = _pyrandom.Random()
    rng2.seed(0)
    p0 = np.linspace(-0.1, 0.1, cfg.Ntest)
    p0 = np.array(rng2.sample(list(p0), cfg.Ntest))
    p1 = _qdot(q0, p0, cfg.lam, cfg.E_bound)
    return np.stack([np.zeros(cfg.Ntest), q0, p1, p0], axis=1)


def section_pairs(cfg: HenonConfig, z0: np.ndarray, n_cuts: int):
    """First ``n_cuts`` section points per orbit, scaled coordinates
    (q2*scale, p2*scale).  Returns (n_cuts, B, 2) with NaN where an orbit has
    fewer cuts."""
    # cut period ~ 2 pi / w1; generous margin on the step budget
    n_steps = int((n_cuts + 2) * 7.5 / cfg.dt)
    cuts, tcuts, count = integrate_sections(
        cfg, jnp.asarray(z0), n_steps, n_cuts
    )
    pts = np.asarray(cuts)[..., [1, 3]] * cfg.scale  # (n_cuts, B, 2)
    return pts, np.asarray(count)
