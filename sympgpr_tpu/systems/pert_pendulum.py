"""Perturbed pendulum (workload 02): stroboscopic Poincare map data.

Reference: ``python/02_pert_pendulum/calc_poincare.py`` — time-periodic
perturbed pendulum ``xdot = e(0.3 x sin 2t + 0.7 x sin 3t) + y``,
``ydot = -e(0.3 y sin 2t + 0.7 y sin 3t) - om^2 sin x`` (e=0.5, om=0.5),
mapped over one 2*pi period with fixed-step RK4 (1500 steps for training,
100 for test), ICs Halton-sampled inside a disc (Burby-style).

Here the RK4 stroboscope is one `lax.scan`, vmapped over all samples — the
reference steps a Python loop per RK stage over the whole batch in numpy.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.systems.halton import halton

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PertPendulumConfig:
    """Constants of ``calc_poincare.py:4-5,53-54,87-93``."""

    e: float = 0.5
    om: float = 0.5
    N: int = 55
    nm: int = 100
    radius: float = 0.9
    rk_steps_train: int = 1500
    rk_steps_test: int = 100
    sig2_n: float = 1e-12
    nics: int = 20

    @property
    def Ntest(self) -> int:
        return self.nics + self.nics // 2


def zdot(t, z, e: float, om: float):
    x, y = z[..., 0], z[..., 1]
    s2, s3 = jnp.sin(2 * t), jnp.sin(3 * t)
    xdot = e * (0.3 * x * s2 + 0.7 * x * s3) + y
    ydot = -e * (0.3 * y * s2 + 0.7 * y * s3) - om**2 * jnp.sin(x)
    return jnp.stack([xdot, ydot], axis=-1)


@partial(jax.jit, static_argnames=("n_rk_steps", "e", "om"))
def rk_pmap(z: Array, e: float, om: float, n_rk_steps: int) -> Array:
    """One stroboscopic period of RK4 (``rk_pmap``, calc_poincare.py:38-51).
    z: (B, 2) -> (B, 2)."""
    dphi = 2.0 * np.pi / n_rk_steps

    def step(carry, i):
        z = carry
        t = i * dphi
        k1 = zdot(t, z, e, om)
        k2 = zdot(t + 0.5 * dphi, z + 0.5 * dphi * k1, e, om)
        k3 = zdot(t + 0.5 * dphi, z + 0.5 * dphi * k2, e, om)
        k4 = zdot(t + dphi, z + dphi * k3, e, om)
        return z + (dphi / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    z, _ = jax.lax.scan(step, z, jnp.arange(n_rk_steps))
    return z


def gen_samples_circle(origin, radius, n_samples):
    """Halton disc sampling (calc_poincare.py:16-24, Burby et al. 2020)."""
    s_radius = 0.5 * radius**2
    samp = halton(n_samples, 2) * np.array([s_radius, 2 * np.pi])
    s, theta = samp[:, 0], samp[:, 1]
    x = origin[0] + np.sqrt(2 * s) * np.cos(theta)
    y = origin[1] + np.sqrt(2 * s) * np.sin(theta)
    return np.stack([x, y], axis=1)


def training_data(cfg: PertPendulumConfig = PertPendulumConfig()):
    """Disc ICs -> one stroboscopic map -> filter to the disc -> shift by pi
    (calc_poincare.py:53-79)."""
    data_raw = gen_samples_circle([0.0, 0.0], cfg.radius, cfg.N)
    labels_raw = np.asarray(
        rk_pmap(jnp.asarray(data_raw), cfg.e, cfg.om, cfg.rk_steps_train)
    )
    rr = labels_raw[:, 0] ** 2 + labels_raw[:, 1] ** 2
    keep = rr <= cfg.radius**2
    data, labels = data_raw[keep], labels_raw[keep]

    q = data[:, 0] + np.pi
    p = data[:, 1]
    Q = labels[:, 0] + np.pi
    P = labels[:, 1]
    X = np.stack([q, P], axis=1)
    z = np.concatenate([p - P, Q - q])
    Xp = np.stack([q, p], axis=1)
    zp = P  # absolute-P aux targets (``main.py:31``)
    return dict(X=X, z=z, Xp=Xp, zp=zp, q=q, p=p, Q=Q, P=P,
                n_data=int(keep.sum()))


def test_initial_conditions(cfg: PertPendulumConfig = PertPendulumConfig()):
    """Deterministic line ICs (calc_poincare.py:87-95), shifted by pi."""
    nics = cfg.nics
    xic = np.linspace(0.05, 0.7, nics)
    yic = np.zeros(nics)
    yic2 = np.linspace(0.3, 0.6, nics // 2)
    xic2 = np.zeros(nics // 2)
    qs = np.concatenate([xic, xic2]) + np.pi
    ps = np.concatenate([yic, yic2])
    return qs, ps


def reference_orbits(cfg: PertPendulumConfig, q0, p0, nm: int):
    """nm stroboscopic iterations of the true map (q already pi-shifted)."""
    z = jnp.stack([jnp.asarray(q0) - np.pi, jnp.asarray(p0)], axis=-1)

    def step(z, _):
        z = rk_pmap(z, cfg.e, cfg.om, cfg.rk_steps_test)
        return z, z

    _, zs = jax.lax.scan(step, z, None, length=nm - 1)
    zs = jnp.concatenate([z[None], zs], axis=0)  # (nm, B, 2)
    return np.asarray(zs[..., 0]) + np.pi, np.asarray(zs[..., 1])
