"""Symplectic map application (the inference hot loop).

Reference: "Algorithm 1" semi-implicit map — per step, solve the scalar
implicit equation ``pGP(q, P) - p + P = 0`` for every orbit
(``python/01_pendulum/implicit/func.py:134-147`` with scipy secant;
``python/05_tokamak/SympGPR/sympgpr.f90:88-125`` with MINPACK hybrd1), then
update ``Q = mod(q + dq, 2*pi)`` (``func.py:126-132``), looping orbits and
steps in Python/Fortran (``python/functions/func.py:216-260``).

TPU-native design decisions:

* The posterior mean of the generating function is a scalar field
  ``g(v) = sig * sum_i alpha[i] . grad_u k(u_i, v)``; *everything* the map
  needs is a derivative of ``g``: ``pGP = dg/dq``, ``dq = dg/dP``, and the
  Newton derivative ``d pGP / dP = d^2 g / dq dP`` — all obtained by autodiff,
  so there is no hand-written Kstar assembly at all and the Newton update uses
  an exact derivative where the reference uses secant (scipy) or
  finite-difference hybrd.
* ``alpha = Ky^{-1} z`` is precomputed once in the model (the reference
  recomputes ``matmul(Kyinv, ztrain)`` inside every residual evaluation,
  ``sympgpr.f90:121``).
* The orbit batch advances in lock-step: one masked Newton `while_loop`
  serves all orbits at once (converged / lost lanes are frozen), inside one
  `lax.scan` over map steps.  Lost orbits are NaN-poisoned exactly like the
  reference and stay frozen at no extra cost.
* Loss-region checks (tokamak ``compute_r`` boundary,
  ``python/05_tokamak/SympGPR/func.py:200-203``) are pluggable vectorized
  predicates evaluated on the whole batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from sympgpr_tpu.gp.model import AuxGP, SympGP

Array = jax.Array


# ---------------------------------------------------------------------------
# Posterior mean machinery


def genfun_mean(sgp: SympGP, v: Array) -> Array:
    """Posterior mean (up to a constant) of the generating function at v=(q,P).

    g(v) = sig * sum_{i,r} alpha[r*N+i] * d k(u_i, v) / d u_r.
    Its v-gradient reproduces the reference's ``Kstar.T @ (Kyinv @ ztrain)``
    predictions (``python/01_pendulum/implicit/func.py:126-139``).
    """
    n = sgp.n_train
    gu = jax.vmap(lambda u: sgp.kernel.grad_u(u, v, sgp.params))(sgp.X)
    a = sgp.alpha.reshape(2, n)
    return sgp.sig * (a[0] @ gu[:, 0] + a[1] @ gu[:, 1])


def dF_mean(sgp: SympGP, v: Array) -> Array:
    """(pGP, dq) at a single mixed point v = (q, P)."""
    return jax.grad(genfun_mean, argnums=1)(sgp, v)


def p_residual_and_slope(sgp: SympGP, q: Array, P: Array, p: Array):
    """Newton residual f(P) = pGP(q,P) - p + P and exact df/dP."""

    def f(Pv):
        return dF_mean(sgp, jnp.array([q, Pv]))[0] - p + Pv

    return f(P), jax.grad(f)(P)


def aux_mean(aux: AuxGP, q: Array, p: Array) -> Array:
    """Posterior mean of the auxiliary ordinary GP at (q, p) (``guessP``,
    ``python/05_tokamak/SympGPR/sympgpr.f90:62-73``)."""
    v = jnp.array([q, p])
    kvec = jax.vmap(lambda u: aux.kernel.fn(u, v, aux.params))(aux.X)
    return aux.sig * (kvec @ aux.alpha)


def guess_P(aux: AuxGP, q: Array, p: Array) -> Array:
    """Initial Newton guess for P."""
    m = aux_mean(aux, q, p)
    return p + m if aux.delta else m


# ---------------------------------------------------------------------------
# Batched implicit solve


@partial(jax.jit, static_argnames=("maxiter",))
def calc_P(
    sgp: SympGP,
    aux: AuxGP,
    q: Array,
    p: Array,
    tol: float = 1e-13,
    maxiter: int = 20,
) -> Array:
    """Solve pGP(q,P) - p + P = 0 for a whole batch of orbits at once.

    Masked lock-step Newton: all lanes iterate together; converged or
    non-finite lanes are frozen.  Replaces per-orbit scipy.newton / hybrd1.
    q, p: (B,) arrays.  Returns (B,) new momenta.
    """
    P0 = jax.vmap(lambda qq, pp: guess_P(aux, qq, pp))(q, p)
    tol = jnp.asarray(tol, dtype=P0.dtype)

    res_slope = jax.vmap(
        lambda qq, PP, pp: p_residual_and_slope(sgp, qq, PP, pp)
    )

    def cond(carry):
        _, done, it = carry
        return jnp.logical_and(~jnp.all(done), it < maxiter)

    def body(carry):
        P, done, it = carry
        f, fp = res_slope(q, P, p)
        step = f / fp
        Pn = P - step
        bad = ~jnp.isfinite(Pn)
        Pn = jnp.where(done | bad, P, Pn)
        newly_done = (jnp.abs(step) < tol * (1.0 + jnp.abs(Pn))) | bad
        return Pn, done | newly_done, it + 1

    done0 = ~jnp.isfinite(P0)
    P, _, _ = jax.lax.while_loop(cond, body, (P0, done0, 0))
    return P


@jax.jit
def calc_Q(sgp: SympGP, q: Array, P: Array) -> Array:
    """Batched Delta-q = dg/dP at (q, P_new) (``calcq``, sympgpr.f90:75-86)."""
    return jax.vmap(lambda qq, PP: dF_mean(sgp, jnp.array([qq, PP]))[1])(q, P)


@jax.jit
def calc_P_explicit(sgp: SympGP, q: Array, p: Array) -> Array:
    """Explicit update for separable (sum) kernels, "Algorithm 2".

    With d^2k/dq dP' = 0 the implicit coupling vanishes and
    P = p - pGP(q, .) directly (``python/01_pendulum/explicit/
    func_expl.py:106-121``, ``python/04_standard_map/func.py:174-179``).
    """
    pGP = jax.vmap(lambda qq, pp: dF_mean(sgp, jnp.array([qq, pp]))[0])(q, p)
    return p - pGP


# ---------------------------------------------------------------------------
# Rollout


class MapConfig(NamedTuple):
    """Static rollout configuration (hashable; safe as a jit static arg)."""

    explicit: bool = False
    mod_q: float | None = 2.0 * 3.141592653589793
    mod_p: float | None = None
    track_pdiff: bool = False
    newton_tol: float = 1e-13
    newton_maxiter: int = 20


class Trajectory(NamedTuple):
    q: Array  # (nm, B)
    p: Array  # (nm, B)
    pdiff: Array | None = None  # (nm, B) unwrapped momentum, standard map


LossFn = Callable[[Array, Array, Array, Array], Array]
# (q_old, q_new, P_new, step_index) -> (B,) bool mask of lost orbits


def _map_step(
    sgp: SympGP,
    aux: AuxGP | None,
    q: Array,
    p: Array,
    step_idx: Array,
    cfg: MapConfig,
    loss_pre: LossFn | None,
    loss_post: LossFn | None,
):
    if cfg.explicit:
        P = calc_P_explicit(sgp, q, p)
    else:
        P = calc_P(sgp, aux, q, p, tol=cfg.newton_tol,
                   maxiter=cfg.newton_maxiter)
    if loss_pre is not None:
        lost = loss_pre(q, q, P, step_idx)
        P = jnp.where(lost, jnp.nan, P)
    dP = P - p
    Pw = jnp.mod(P, cfg.mod_p) if cfg.mod_p is not None else P
    dq = calc_Q(sgp, q, Pw)
    Q = dq + q
    if cfg.mod_q is not None:
        Q = jnp.mod(Q, cfg.mod_q)
    if loss_post is not None:
        lost = loss_post(q, Q, Pw, step_idx)
        Pw = jnp.where(lost, jnp.nan, Pw)
        Q = jnp.where(lost, jnp.nan, Q)
    Q = jnp.where(jnp.isnan(Pw), jnp.nan, Q)
    return Q, Pw, dP


def apply_map(
    sgp: SympGP,
    aux: AuxGP | None,
    q0: Array,
    p0: Array,
    nm: int,
    cfg: MapConfig = MapConfig(),
    loss_pre: LossFn | None = None,
    loss_post: LossFn | None = None,
    prefer_fast: bool = True,
) -> Trajectory:
    """Iterate the learned map nm-1 times for a batch of orbits.

    Returns (nm, B) trajectories whose row 0 is the initial condition,
    matching the array layout of the reference's ``applymap*`` loops
    (``python/functions/func.py:216-260``).

    For the product/sum kernels in this family (all of them today) the
    call dispatches to the factorized fast path (``maps/fast_apply.py``):
    identical semantics (validated at 1e-12, ``tests/test_fast_apply.py``)
    with the Newton-invariant q-side factors hoisted out of the iteration
    — 2-3x fewer transcendentals per step.  ``prefer_fast=False`` forces
    the generic autodiff path (the differential-testing oracle).
    """
    from sympgpr_tpu.maps import fast_apply

    if prefer_fast and fast_apply.supports(sgp.kernel.name):
        return fast_apply.apply_map_fast(sgp, aux, q0, p0, nm, cfg,
                                         loss_pre, loss_post)
    return _apply_map_generic(sgp, aux, q0, p0, nm, cfg, loss_pre,
                              loss_post)


@partial(jax.jit, static_argnames=("nm", "cfg", "loss_pre", "loss_post"))
def _apply_map_generic(
    sgp: SympGP,
    aux: AuxGP | None,
    q0: Array,
    p0: Array,
    nm: int,
    cfg: MapConfig = MapConfig(),
    loss_pre: LossFn | None = None,
    loss_post: LossFn | None = None,
) -> Trajectory:
    """Autodiff-everything rollout (any kernel; the fast path's oracle)."""
    q0 = jnp.atleast_1d(q0)
    p0 = jnp.atleast_1d(p0)

    def step(carry, i):
        q, p, pdiff = carry
        Q, P, dP = _map_step(sgp, aux, q, p, i, cfg, loss_pre, loss_post)
        pdiff = pdiff + dP
        return (Q, P, pdiff), (Q, P, pdiff)

    init = (q0, p0, p0)
    _, (qs, ps, pdiffs) = jax.lax.scan(step, init, jnp.arange(nm - 1))
    q_traj = jnp.concatenate([q0[None], qs], axis=0)
    p_traj = jnp.concatenate([p0[None], ps], axis=0)
    if cfg.track_pdiff:
        pd = jnp.concatenate([p0[None], pdiffs], axis=0)
        return Trajectory(q_traj, p_traj, pd)
    return Trajectory(q_traj, p_traj, None)


@partial(jax.jit, static_argnames=("nm", "n_maps", "cfg", "loss_post"))
def apply_map_split(
    sgps: SympGP,
    auxes: AuxGP,
    q0: Array,
    p0: Array,
    nm: int,
    n_maps: int,
    cfg: MapConfig = MapConfig(),
    loss_post: LossFn | None = None,
) -> Trajectory:
    """Split variant: cycle through ``n_maps`` independently fitted sub-maps.

    ``sgps``/``auxes`` are stacked pytrees (leading axis ``n_maps`` on every
    array leaf).  Step i uses sub-map ``i % n_maps``, reproducing the Split
    tokamak application loop (``python/05_tokamak/Split_SympGPR/func.py``
    ``applymap_tok``).
    """
    q0 = jnp.atleast_1d(q0)
    p0 = jnp.atleast_1d(p0)

    def step(carry, i):
        q, p = carry
        m = jnp.mod(i, n_maps)
        sgp_m = jax.tree_util.tree_map(lambda a: a[m], sgps)
        aux_m = jax.tree_util.tree_map(lambda a: a[m], auxes)
        Q, P, _ = _map_step(sgp_m, aux_m, q, p, i, cfg, None, loss_post)
        return (Q, P), (Q, P)

    _, (qs, ps) = jax.lax.scan(step, (q0, p0), jnp.arange(nm - 1))
    return Trajectory(
        jnp.concatenate([q0[None], qs], axis=0),
        jnp.concatenate([p0[None], ps], axis=0),
        None,
    )


def stack_models(models: list) -> SympGP | AuxGP:
    """Stack a list of identically-shaped fitted models into one pytree with
    a leading model axis (for apply_map_split)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *models)
