"""Tokamak field-line system (workload 05) — fully JAX, batched.

Reference physics: ``python/05_tokamak/SympGPR/fieldlines.f90`` — perturbed
vector potential on circular flux surfaces,

  Ath = B0 (r^2/2 - r^3/(3 R0) cos th)
  Aph = -B0 iota0 (r^2/2 - r^4/(4 a^2)) (1 + eps cos(m th + n ph + phase))

with a semi-implicit midpoint field-line stepper in (pth, th, ph)
(``F_tstep``/``timestep``, fieldlines.f90:110-172, hybrd1 tol 1e-13) and an
implicit minor radius r(pth, th, ph) from a fixed 20-iteration Newton
(``compute_r``, fieldlines.f90:94-107).

TPU-native design: the Fortran module-global state (dph, eps, m, n, phase and
the mutated ``rlast`` warm-start cache, fieldlines.f90:12-17,122) becomes an
explicit dataclass + scan carry; the per-step hybrd1 2-D root solve becomes a
fixed-iteration Newton with an exact `jacfwd` Jacobian; all particles advance
together under `vmap`.  The reference integrates particles one at a time in a
Python loop calling into f2py per step
(``calc_fieldlines.py:51-53``).
"""

from __future__ import annotations

import dataclasses
import random as _pyrandom
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.systems.halton import halton

Array = jax.Array

B0 = 1.0
IOTA0 = 1.0  # constant part of rotational transform
A_MINOR = 0.5  # (equivalent) minor radius
R0 = 1.0  # (equivalent) major radius


@dataclasses.dataclass(frozen=True)
class TokamakField:
    """Perturbation parameters (``fieldlines.init``, fieldlines.f90:21-31)."""

    eps: float = 0.001
    m: int = -3
    n: int = 2
    phase: float = 0.0


def Ath(r, th, ph):
    return B0 * (r**2 / 2.0 - r**3 / (3.0 * R0) * jnp.cos(th))


def dAthdr(r, th, ph):
    return B0 * (r - r**2 / R0 * jnp.cos(th))


def dAthdth(r, th, ph):
    return B0 * r**3 * jnp.sin(th) / (3.0 * R0)


def Aph(field: TokamakField, r, th, ph):
    pert = 1.0 + field.eps * jnp.cos(field.m * th + field.n * ph + field.phase)
    return -B0 * IOTA0 * (r**2 / 2.0 - r**4 / (4.0 * A_MINOR**2)) * pert


def dAphdr(field: TokamakField, r, th, ph):
    pert = 1.0 + field.eps * jnp.cos(field.m * th + field.n * ph + field.phase)
    return -B0 * IOTA0 * (r - r**3 / A_MINOR**2) * pert


def dAphdth(field: TokamakField, r, th, ph):
    return (
        B0
        * IOTA0
        * (r**2 / 2.0 - r**4 / (4.0 * A_MINOR**2))
        * field.m
        * field.eps
        * jnp.sin(field.m * th + field.n * ph + field.phase)
    )


def compute_r(pth, th, ph, rstart, iters: int = 20):
    """Minor radius from pth = Ath(r, th): fixed 20-iteration Newton
    (fieldlines.f90:94-107) — already the ideal TPU shape (static trip count).
    """

    def body(_, r):
        y = pth - Ath(r, th, ph)
        dy = -dAthdr(r, th, ph)
        return r - y / dy

    return jax.lax.fori_loop(0, iters, body, rstart)


def _tstep_residual(field, dph, znew, zold, rlast):
    """Midpoint residual of F_tstep (fieldlines.f90:110-140).

    znew: (2,) = (pth, th) candidates; zold: (3,) = (pth, th, ph).
    Returns ((2,) residual, mid-point r).
    """
    mid = 0.5 * (zold[:2] + znew)
    ph = zold[2] + 0.5 * dph
    r = compute_r(mid[0], mid[1], ph, rlast)
    dApdr = dAphdr(field, r, mid[1], ph)
    dApdt = dAphdth(field, r, mid[1], ph)
    dAtdr = dAthdr(r, mid[1], ph)
    dAtdt = dAthdth(r, mid[1], ph)
    y1 = zold[0] - znew[0] + dph * (dApdt - dApdr * dAtdt / dAtdr)
    y2 = zold[1] - znew[1] - dph * dApdr / dAtdr
    return jnp.array([y1, y2]), r


def timestep(field: TokamakField, dph, z, rlast, newton_iters: int = 8):
    """One semi-implicit midpoint step; returns (z_new (3,), rlast_new).

    Replaces the hybrd1 call (fieldlines.f90:154, tol 1e-13) with Newton on
    the 2-D residual using the exact jacfwd Jacobian (the reference's
    hand-coded Jacobian slot is left zeroed and hybrd falls back to finite
    differences, fieldlines.f90:134-138).
    """

    def res(znew):
        return _tstep_residual(field, dph, znew, z, rlast)[0]

    jac = jax.jacfwd(res)

    def body(_, znew):
        f = res(znew)
        J = jac(znew)
        # closed-form 2x2 solve (Cramer); jnp.linalg.solve lowers to an LU
        # decomposition, which the TPU backend rejects in f64
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        dx0 = (f[0] * J[1, 1] - f[1] * J[0, 1]) / det
        dx1 = (J[0, 0] * f[1] - J[1, 0] * f[0]) / det
        return znew - jnp.stack([dx0, dx1])

    znew = jax.lax.fori_loop(0, newton_iters, body, z[:2])
    _, r_mid = _tstep_residual(field, dph, znew, z, rlast)
    return jnp.array([znew[0], znew[1], z[2] + dph]), r_mid


@partial(jax.jit, static_argnames=("field", "n_steps", "nph", "save_every"))
def integrate_fieldlines(
    field: TokamakField,
    pth0: Array,
    th0: Array,
    ph0: Array,
    nph: int,
    n_steps: int,
    rlast0: Array,
    save_every: int = 1,
):
    """Batched field-line integration: (n_saved+1, B, 3) trajectories.

    dph = 2 pi / nph.  All B particles advance in lock-step under one scan.
    """
    dph = 2.0 * np.pi / nph
    z0 = jnp.stack([pth0, th0, ph0], axis=-1)  # (B, 3)

    step = jax.vmap(lambda z, r: timestep(field, dph, z, r))

    def inner(carry, _):
        z, rl = carry
        z, rl = step(z, rl)
        return (z, rl), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(inner, carry, None, length=save_every)
        return carry, carry[0]

    assert n_steps % save_every == 0
    (_, _), zs = jax.lax.scan(
        outer, (z0, rlast0), None, length=n_steps // save_every
    )
    return jnp.concatenate([z0[None], zs], axis=0)


def _fieldline_rhs(field: TokamakField, z: Array, ph, rlast):
    """Explicit field-line ODE in (pth, th) with ph as time
    (``fieldlines_rk.py:43-50``):  pth' = dAph/dth − dAph/dr · dAth/dth / dAth/dr,
    th' = −dAph/dr / dAth/dr.  Returns ((2,) rhs, minor radius used)."""
    r = compute_r(z[0], z[1], ph, rlast)
    dApdr = dAphdr(field, r, z[1], ph)
    dApdt = dAphdth(field, r, z[1], ph)
    dAtdr = dAthdr(r, z[1], ph)
    dAtdt = dAthdth(r, z[1], ph)
    return jnp.array([dApdt - dApdr * dAtdt / dAtdr, -dApdr / dAtdr]), r


@partial(jax.jit, static_argnames=("field", "n_steps", "nph"))
def integrate_fieldlines_rk4(
    field: TokamakField,
    pth0: Array,
    th0: Array,
    ph0: Array,
    nph: int,
    n_steps: int,
    rlast0: Array,
):
    """Explicit RK4 cross-integrator (validation twin of the reference's
    ``fieldlines_rk.py`` odeint path, P10): independent discretization of the
    same field-line flow as the semi-implicit midpoint ``timestep``; the two
    trajectories agreeing is a physics invariant check, not a tautology.
    Batched over B particles; returns (n_steps+1, B, 3)."""
    dph = 2.0 * np.pi / nph
    z0 = jnp.stack([pth0, th0, ph0], axis=-1)

    def one(z, rl):
        ph = z[2]
        k1, r1 = _fieldline_rhs(field, z[:2], ph, rl)
        k2, _ = _fieldline_rhs(field, z[:2] + 0.5 * dph * k1, ph + 0.5 * dph, r1)
        k3, _ = _fieldline_rhs(field, z[:2] + 0.5 * dph * k2, ph + 0.5 * dph, r1)
        k4, _ = _fieldline_rhs(field, z[:2] + dph * k3, ph + dph, r1)
        znew = z[:2] + dph / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return jnp.array([znew[0], znew[1], ph + dph]), r1

    step = jax.vmap(one)

    def body(carry, _):
        z, rl = carry
        z, rl = step(z, rl)
        return (z, rl), z

    (_, _), zs = jax.lax.scan(body, (z0, rlast0), None, length=n_steps)
    return jnp.concatenate([z0[None], zs], axis=0)


# ---------------------------------------------------------------------------
# Workload data generation


@dataclasses.dataclass(frozen=True)
class TokamakConfig:
    """Constants of ``python/05_tokamak/SympGPR/calc_fieldlines.py:18-33``
    (nphmap>1 switches to the Split layout,
    ``Split_SympGPR/calc_fieldlines.py:11-18``)."""

    N: int = 80
    nm: int = 1000
    nturn: int = 2
    nph: int = 32
    nphmap: int = 1
    eps: float = 0.001
    mod_m: int = -3
    mod_n: int = 2
    sig2_n: float = 1e-14
    Ntest: int = 30
    r_scale: float = 0.26  # Halton box: r in [0.1, 0.1+r_scale]
    qminmap: float = 0.15
    qmaxmap: float = 0.25
    qminplt: float = 0.15
    qmaxplt: float = 0.31
    momentum_scale: float = 1e2  # P scaling (calc_fieldlines.py:65-67)

    @property
    def field(self) -> TokamakField:
        return TokamakField(eps=self.eps, m=self.mod_m, n=self.mod_n)


def training_data(cfg: TokamakConfig = TokamakConfig()):
    """Halton ICs -> one-turn (or per-split) map pairs in scaled variables.

    Returns per-split arrays shaped (N, nphmap): q, p, Q, P with
    p = pth * 1e2, matching ``calc_fieldlines.py:64-67``.
    """
    s = halton(cfg.N, 3)
    r0 = s[:, 0] * cfg.r_scale + 0.1
    th0 = s[:, 1] * 2.0 * np.pi
    pth0 = np.asarray(Ath(r0, th0, 0.0))

    n_steps = cfg.nph * cfg.nturn
    traj = integrate_fieldlines(
        cfg.field,
        jnp.asarray(pth0),
        jnp.asarray(th0),
        jnp.zeros(cfg.N),
        cfg.nph,
        n_steps,
        jnp.asarray(r0),
    )
    traj = np.asarray(traj)  # (n_steps+1, N, 3)

    ind = cfg.nph // cfg.nphmap
    M = cfg.nphmap
    q = np.stack([traj[i * ind, :, 1] for i in range(M)], axis=1)
    p = np.stack([traj[i * ind, :, 0] for i in range(M)], axis=1) * cfg.momentum_scale
    Q = np.stack([traj[(i + 1) * ind, :, 1] for i in range(M)], axis=1)
    P = np.stack([traj[(i + 1) * ind, :, 0] for i in range(M)], axis=1) * cfg.momentum_scale
    return dict(q=q, p=p, Q=Q, P=P, traj=traj)


def test_initial_conditions(cfg: TokamakConfig = TokamakConfig()):
    """(r, th) test ICs for the GP rollout and the plotting/reference set
    (``calc_fieldlines.py:92-108``: seed-1 sampled linspaces)."""

    def sample(qmin, qmax):
        rng = _pyrandom.Random()
        rng.seed(1)
        q0 = np.linspace(qmin, qmax, cfg.Ntest)
        p0 = np.linspace(0.0, 2.0 * np.pi, cfg.Ntest)
        q0 = np.array(rng.sample(list(q0), cfg.Ntest))
        p0 = np.array(rng.sample(list(p0), cfg.Ntest))
        return q0, p0  # (r, th)

    return sample(cfg.qminmap, cfg.qmaxmap), sample(cfg.qminplt, cfg.qmaxplt)


def ics_to_pth(r, th):
    """Convert (r, th) ICs to canonical (pth, th)."""
    return np.asarray(Ath(np.asarray(r), np.asarray(th), 0.0)), np.asarray(th)


def reference_orbits(cfg: TokamakConfig, r0, th0, n_turns: int):
    """Integrate reference test orbits; returns (n_steps+1, B, 3)."""
    pth0, th0 = ics_to_pth(r0, th0)
    return integrate_fieldlines(
        cfg.field,
        jnp.asarray(pth0),
        jnp.asarray(th0),
        jnp.zeros(len(th0)),
        cfg.nph,
        cfg.nph * n_turns,
        jnp.asarray(np.asarray(r0)),
        save_every=1,
    )


def field_energy(field: TokamakField, q: Array, p_scaled: Array,
                 ph: Array | float = 0.0, r_guess: float = 0.3) -> Array:
    """H = -Aph(r(pth, th), th, ph) (Split ``energy()``); p_scaled = pth*1e2."""
    pth = p_scaled * 1e-2
    r = compute_r(pth, q, ph, jnp.full_like(pth, r_guess))
    return -Aph(field, r, q, ph)


def safety_factor(field: TokamakField, r0: float, n_turns: int = 10,
                  nph: int = 64) -> float:
    """q = dphi/dtheta physics invariant used by the reference's
    cross-integrator checks (``fieldlines_fast.py:44``)."""
    pth0 = float(Ath(r0, 0.0, 0.0))
    traj = integrate_fieldlines(
        field, jnp.array([pth0]), jnp.zeros(1), jnp.zeros(1), nph,
        nph * n_turns, jnp.array([r0]),
    )
    dth = float(traj[-1, 0, 1] - traj[0, 0, 1])
    dph = float(traj[-1, 0, 2] - traj[0, 0, 2])
    return dph / dth
