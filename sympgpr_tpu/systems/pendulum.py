"""Pendulum system: data generation and reference integration.

Reference workload 01 (``python/01_pendulum/implicit/main.py``):
``H = p^2/2 + U0 (1 - cos(q + pi))``; training pairs are produced by
integrating the ODE for time ``T_map = dtsymp * Nm`` from Halton-sampled
initial conditions (``main.py:86-114``), test reference orbits by long
integration (``main.py:180-186``).  The reference calls scipy ``solve_ivp``
(LSODA/RK45, rtol 1e-13) per orbit in a Python loop; here the integrator is a
batched fixed-step RK4 `lax.scan` — all orbits advance in one fused device
loop.  A scipy path is kept for cross-validation in tests.
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
class PendulumConfig:
    """Constants of ``python/01_pendulum/implicit/main.py:57-75``."""

    U0: float = 1.0
    N: int = 20
    Nm: int = 200
    nm: int = 1000
    dtsymp: float = 1e-3
    sig2_n: float = 1e-16
    Ntest: int = 15
    qmin: float = 0.0
    qmax: float = 2.0 * np.pi
    pmin: float = -3.0
    pmax: float = 3.0
    qminmap: float = np.pi - 2.8
    qmaxmap: float = np.pi + 1.5
    pminmap: float = -2.3
    pmaxmap: float = 1.8


def rhs(y: Array) -> Array:
    """(dq/dt, dp/dt) = (p, -sin(q + pi))."""
    return jnp.stack([y[..., 1], -jnp.sin(y[..., 0] + jnp.pi)], axis=-1)


def integrate_rk4(
    q0: Array, p0: Array, t_final: float, n_steps: int, save_every: int = 0
) -> Array:
    """Batched fixed-step RK4.

    Returns final states (B, 2), or the trajectory (n_saved+1, B, 2) when
    ``save_every`` > 0 (every ``save_every``-th step, starting with the IC).
    """
    y0 = jnp.stack([jnp.atleast_1d(q0), jnp.atleast_1d(p0)], axis=-1)
    dt = t_final / n_steps

    def rk4_step(y, _):
        k1 = rhs(y)
        k2 = rhs(y + 0.5 * dt * k1)
        k3 = rhs(y + 0.5 * dt * k2)
        k4 = rhs(y + dt * k3)
        yn = y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return yn, None

    if save_every <= 0:
        y, _ = jax.lax.scan(rk4_step, y0, None, length=n_steps)
        return y

    assert n_steps % save_every == 0

    def outer(y, _):
        y, _ = jax.lax.scan(rk4_step, y, None, length=save_every)
        return y, y

    y_last, ys = jax.lax.scan(outer, y0, None, length=n_steps // save_every)
    return jnp.concatenate([y0[None], ys], axis=0)


def symplectic_euler(
    q0: Array, p0: Array, dt: float, n_steps: int
) -> tuple[Array, Array]:
    """The cost-matched comparator integrator (``intode``,
    ``python/01_pendulum/implicit/func.py:34-42``): p first, then q.
    Returns (n_steps+1, B) trajectories."""
    q0 = jnp.atleast_1d(q0)
    p0 = jnp.atleast_1d(p0)

    def step(carry, _):
        q, p = carry
        p = p - dt * jnp.sin(q + jnp.pi)
        q = q + dt * p
        return (q, p), (q, p)

    _, (qs, ps) = jax.lax.scan(step, (q0, p0), None, length=n_steps)
    return (
        jnp.concatenate([q0[None], qs]),
        jnp.concatenate([p0[None], ps]),
    )


def training_data(cfg: PendulumConfig = PendulumConfig()):
    """Halton ICs -> integrate one map time -> mixed-variable training set.

    Returns dict with X=(N,2) mixed (q,P), z=(2N,), Xp=(N,2) (q,p) and
    zp=(N,) for the auxiliary GP (absolute-P targets, pendulum style,
    ``main.py:124-125``), plus the raw (q, p, Q, P).
    """
    s = halton(cfg.N, 2)
    q = s[:, 0] * (cfg.qmax - cfg.qmin) + cfg.qmin
    p = s[:, 1] * (cfg.pmax - cfg.pmin) + cfg.pmin
    t_map = cfg.dtsymp * cfg.Nm
    # 10x oversampled RK4 relative to the reference's dtsymp grid
    yf = integrate_rk4(q, p, t_map, 10 * cfg.Nm)
    Q, P = np.asarray(yf[:, 0]), np.asarray(yf[:, 1])
    X = np.stack([q, P], axis=1)
    z = np.concatenate([p - P, Q - q])
    Xp = np.stack([q, p], axis=1)
    zp = P
    return dict(X=X, z=z, Xp=Xp, zp=zp, q=q, p=p, Q=Q, P=P, t_map=t_map)


def test_initial_conditions(cfg: PendulumConfig = PendulumConfig()):
    """Reproduces ``random.seed(1); random.sample(linspace, Ntest)``
    (``main.py:77-84``) exactly via the stdlib RNG."""
    rng = _pyrandom.Random()
    rng.seed(1)
    q0 = np.linspace(cfg.qminmap, cfg.qmaxmap, cfg.Ntest)
    p0 = np.linspace(cfg.pminmap, cfg.pmaxmap, cfg.Ntest)
    q0 = np.array(rng.sample(list(q0), cfg.Ntest))
    p0 = np.array(rng.sample(list(p0), cfg.Ntest))
    return q0, p0


def integrate_scipy(q0, p0, t_eval, method="LSODA"):
    """Reference-parity integrator (``main.py:32-38``), for tests."""
    from scipy.integrate import solve_ivp

    def dydt(t, y):
        return [y[1], -np.sin(y[0] + np.pi)]

    out = []
    for qq, pp in zip(np.atleast_1d(q0), np.atleast_1d(p0)):
        res = solve_ivp(
            dydt, [t_eval[0], t_eval[-1]], [qq, pp], t_eval=t_eval,
            method=method, rtol=1e-13, atol=1e-16,
        )
        out.append(res.y)
    return np.array(out)  # (B, 2, T)
