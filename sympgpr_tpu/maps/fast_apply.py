"""Factorized fast path for map application with product kernels.

For every product kernel in this family, k(u, v) = A(dq) * B(dP) with
B = exp(-dP^2 / (2 ly^2)) and A = exp(-s(dq)).  During the implicit Newton
solve for P the test q is fixed, so the A-side factors (A, s', s'') of all
(batch x train) pairs are *invariant across Newton iterations*.  The generic
path (``maps/symplectic.py``) re-evaluates the full Hessian blocks (2 sin +
2 exp per pair) every iteration; here they are computed once per map step and
folded into four coefficient matrices:

  pGP(P)       = sum_i (c0 + c1 dP) B(dP)
  d pGP / d P  = sum_i (c0 dP/ly^2 + c1 (dP^2/ly^2 - 1)) B(dP)
  qGP(P)       = sum_i (c2 dP + c3 (1/ly^2 - dP^2/ly^4)) B(dP)

with c0 = sig a0 (s'' - s'^2) A, c1 = -sig a1 s' A / ly^2,
c2 = -sig a0 s' A / ly^2, c3 = sig a1 A, dP = u_P - P.  Each Newton
iteration then costs one exp + O(10) arithmetic ops per pair plus two
row reductions (matvec-shaped, MXU-eligible).

The derivative identities are validated against the autodiff path in
``tests/test_fast_apply.py`` (rtol 1e-12, float64).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sympgpr_tpu.gp.model import AuxGP, SympGP
from sympgpr_tpu.maps.symplectic import MapConfig, Trajectory

Array = jax.Array

_FAST_KERNELS = ("per_se", "se_se", "per_se_freq")
_FAST_SUM_KERNELS = ("sum_per_se",)
# a sum kernel's q-side addend determines its A-factor set; any new sum
# kernel must register here (a silent per_se default would be wrong)
_SUM_QSIDE = {"sum_per_se": "per_se"}


def supports(kernel_name: str) -> bool:
    return kernel_name in _FAST_KERNELS + _FAST_SUM_KERNELS


def _q_factors(name: str, d: Array, params: Array):
    """A(d), s'(d), s''(d) for the q-side factor A = exp(-s)."""
    lx = params[0]
    if name == "per_se":
        s = jnp.sin(0.5 * d) ** 2 / (2.0 * lx**2)
        sp = jnp.sin(d) / (4.0 * lx**2)
        spp = jnp.cos(d) / (4.0 * lx**2)
    elif name == "se_se":
        s = d**2 / (2.0 * lx**2)
        sp = d / lx**2
        spp = jnp.ones_like(d) / lx**2
    elif name == "per_se_freq":
        f = params[2]
        s = jnp.sin(f * d) ** 2 / (2.0 * lx**2)
        sp = f * jnp.sin(2.0 * f * d) / (2.0 * lx**2)
        spp = f**2 * jnp.cos(2.0 * f * d) / lx**2
    else:  # pragma: no cover
        raise ValueError(name)
    return jnp.exp(-s), sp, spp


class StepCoeffs(NamedTuple):
    """Newton-invariant per-(orbit, train-point) coefficients."""

    c0: Array  # (B, N)
    c1: Array
    c2: Array
    c3: Array
    uP: Array  # (N,) train momenta
    ly: Array


def p_explicit_sum(sgp: SympGP, q: Array) -> Array:
    """pGP for a *sum* (separable) kernel — depends only on q:
    pGP = sum_i sig a0_i (s'' - s'^2) A(dq) (the B addend has no dq
    dependence, so its contribution to the dq dq' block vanishes)."""
    n = sgp.n_train
    d = sgp.X[None, :, 0] - q[:, None]
    A, sp, spp = _q_factors(_SUM_QSIDE[sgp.kernel.name], d, sgp.params)
    a0 = sgp.alpha.reshape(2, n)[0]
    return sgp.sig * jnp.sum(a0[None, :] * (spp - sp * sp) * A, axis=-1)


def q_update_sum(sgp: SympGP, P: Array) -> Array:
    """Delta q for a sum kernel — depends only on P:
    dq = sum_i sig a1_i (1/ly^2 - dP^2/ly^4) B(dP)."""
    n = sgp.n_train
    ly = sgp.params[1]
    dP = sgp.X[None, :, 1] - P[:, None]
    B = jnp.exp(-(dP**2) / (2.0 * ly**2))
    a1 = sgp.alpha.reshape(2, n)[1]
    ily2 = 1.0 / ly**2
    return sgp.sig * jnp.sum(
        a1[None, :] * (ily2 - dP**2 * ily2**2) * B, axis=-1
    )


def precompute_step(sgp: SympGP, q: Array) -> StepCoeffs:
    n = sgp.n_train
    params = sgp.params
    ly = params[1]
    uq = sgp.X[:, 0]
    d = uq[None, :] - q[:, None]  # (B, N), dq = u_q - v_q
    A, sp, spp = _q_factors(sgp.kernel.name, d, params)
    a = sgp.alpha.reshape(2, n)
    a0 = a[0][None, :]
    a1 = a[1][None, :]
    sig = sgp.sig
    c0 = sig * a0 * (spp - sp**2) * A
    c1 = -sig * a1 * sp * A / ly**2
    c2 = -sig * a0 * sp * A / ly**2
    c3 = sig * a1 * A
    return StepCoeffs(c0, c1, c2, c3, sgp.X[:, 1], ly)


def p_value_slope(co: StepCoeffs, P: Array):
    """(pGP, d pGP/dP) for the whole batch; one exp per pair."""
    dP = co.uP[None, :] - P[:, None]
    B = jnp.exp(-(dP**2) / (2.0 * co.ly**2))
    ily2 = 1.0 / co.ly**2
    pGP = jnp.sum((co.c0 + co.c1 * dP) * B, axis=-1)
    slope = jnp.sum(
        (co.c0 * dP * ily2 + co.c1 * (dP**2 * ily2 - 1.0)) * B, axis=-1
    )
    return pGP, slope


def q_update(co: StepCoeffs, P: Array) -> Array:
    """qGP (= Delta q) at the solved P."""
    dP = co.uP[None, :] - P[:, None]
    B = jnp.exp(-(dP**2) / (2.0 * co.ly**2))
    ily2 = 1.0 / co.ly**2
    return jnp.sum((co.c2 * dP + co.c3 * (ily2 - dP**2 * ily2**2)) * B,
                   axis=-1)


def aux_guess(aux: AuxGP, q: Array, p: Array) -> Array:
    """Batched aux-GP posterior mean, factorized (one pass)."""
    params = aux.params
    ly = params[1]
    d = aux.X[None, :, 0] - q[:, None]
    A, _, _ = _q_factors(aux.kernel.name, d, params)
    dP = aux.X[None, :, 1] - p[:, None]
    Bf = jnp.exp(-(dP**2) / (2.0 * ly**2))
    mean = aux.sig * jnp.sum(aux.alpha[None, :] * A * Bf, axis=-1)
    return p + mean if aux.delta else mean


def newton_P(
    co: StepCoeffs, p: Array, P0: Array, tol: float, maxiter: int,
    fixed_iters: bool,
) -> Array:
    """Batched Newton on f(P) = pGP(P) - p + P with Newton-invariant
    coefficients.  ``fixed_iters`` runs exactly ``maxiter`` iterations with
    no cross-lane convergence sync (fastest on TPU); otherwise a masked
    while_loop with early exit."""

    if fixed_iters:
        def body(_, P):
            f, fp = p_value_slope(co, P)
            Pn = P - (f - p + P) / (fp + 1.0)
            return jnp.where(jnp.isfinite(Pn), Pn, P)

        return jax.lax.fori_loop(0, maxiter, body, P0)

    tol = jnp.asarray(tol, dtype=P0.dtype)

    def cond(carry):
        _, done, it = carry
        return jnp.logical_and(~jnp.all(done), it < maxiter)

    def body(carry):
        P, done, it = carry
        f, fp = p_value_slope(co, P)
        step = (f - p + P) / (fp + 1.0)
        Pn = P - step
        bad = ~jnp.isfinite(Pn)
        Pn = jnp.where(done | bad, P, Pn)
        done = done | (jnp.abs(step) < tol * (1.0 + jnp.abs(Pn))) | bad
        return Pn, done, it + 1

    P, _, _ = jax.lax.while_loop(cond, body, (P0, ~jnp.isfinite(P0), 0))
    return P


@partial(
    jax.jit,
    static_argnames=("nm", "cfg", "loss_pre", "loss_post", "fixed_iters"),
)
def apply_map_fast(
    sgp: SympGP,
    aux: AuxGP | None,
    q0: Array,
    p0: Array,
    nm: int,
    cfg: MapConfig = MapConfig(),
    loss_pre=None,
    loss_post=None,
    fixed_iters: bool = False,
) -> Trajectory:
    """Drop-in replacement for ``apply_map`` on product kernels.

    Same semantics as ``maps.symplectic.apply_map`` (validated in tests);
    2-3x fewer transcendentals per step and optionally sync-free Newton.
    """
    assert supports(sgp.kernel.name), sgp.kernel.name
    is_sum = sgp.kernel.name in _FAST_SUM_KERNELS
    if is_sum and not cfg.explicit:
        raise ValueError("sum kernels imply the explicit map (Algorithm 2)")
    q0 = jnp.atleast_1d(q0)
    p0 = jnp.atleast_1d(p0)

    def step(carry, i):
        q, p, pdiff = carry
        if is_sum:
            co = None
            P = p - p_explicit_sum(sgp, q)
        elif cfg.explicit:
            co = precompute_step(sgp, q)
            pGP, _ = p_value_slope(co, p)
            P = p - pGP
        else:
            co = precompute_step(sgp, q)
            P0 = aux_guess(aux, q, p)
            P = newton_P(co, p, P0, cfg.newton_tol, cfg.newton_maxiter,
                         fixed_iters)
        if loss_pre is not None:
            lost = loss_pre(q, q, P, i)
            P = jnp.where(lost, jnp.nan, P)
        dPc = P - p
        Pw = jnp.mod(P, cfg.mod_p) if cfg.mod_p is not None else P
        dq = q_update_sum(sgp, Pw) if is_sum else q_update(co, Pw)
        Q = dq + q
        if cfg.mod_q is not None:
            Q = jnp.mod(Q, cfg.mod_q)
        if loss_post is not None:
            lost = loss_post(q, Q, Pw, i)
            Pw = jnp.where(lost, jnp.nan, Pw)
            Q = jnp.where(lost, jnp.nan, Q)
        Q = jnp.where(jnp.isnan(Pw), jnp.nan, Q)
        pdiff = pdiff + dPc
        return (Q, Pw, pdiff), (Q, Pw, pdiff)

    _, (qs, ps, pd) = jax.lax.scan(step, (q0, p0, p0), jnp.arange(nm - 1))
    q_traj = jnp.concatenate([q0[None], qs], axis=0)
    p_traj = jnp.concatenate([p0[None], ps], axis=0)
    if cfg.track_pdiff:
        return Trajectory(q_traj, p_traj,
                          jnp.concatenate([p0[None], pd], axis=0))
    return Trajectory(q_traj, p_traj, None)
