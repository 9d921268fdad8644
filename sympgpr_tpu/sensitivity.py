"""Sobol sensitivity analysis over system parameters.

New capability called out in BASELINE.json ("05_tokamak — ... Sobol
sensitivity over params"; absent in the reference code).  Saltelli's
estimator for first-order and total-effect indices, with the quantity of
interest evaluated for the whole A/B/AB sample matrix in one batched,
jitted sweep — on TPU, all (d + 2) * n QoI evaluations run as a single
vmapped program.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.systems.halton import halton

Array = jax.Array


def saltelli_sample(n: int, bounds: Sequence[tuple[float, float]],
                    seed: int = 0) -> np.ndarray:
    """((d+2)*n, d) Saltelli design from two quasi-random matrices A, B."""
    d = len(bounds)
    U = halton(2 * n, 2 * d)
    A = U[:n, :d]
    B = U[:n, d:]
    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])

    def scale(M):
        return lo + M * (hi - lo)

    mats = [scale(A), scale(B)]
    for i in range(d):
        ABi = A.copy()
        ABi[:, i] = B[:, i]
        mats.append(scale(ABi))
    return np.concatenate(mats, axis=0)


def sobol_indices(
    qoi: Callable[[Array], Array],
    bounds: Sequence[tuple[float, float]],
    n: int = 256,
    seed: int = 0,
):
    """First-order S1 and total-effect ST indices of ``qoi`` over ``bounds``.

    ``qoi`` maps a (d,) parameter vector to a scalar; it is vmapped over the
    entire Saltelli design (one fused evaluation sweep).
    """
    d = len(bounds)
    X = jnp.asarray(saltelli_sample(n, bounds, seed))
    Y = np.asarray(jax.jit(jax.vmap(qoi))(X), dtype=np.float64)
    fA = Y[:n]
    fB = Y[n : 2 * n]
    var = np.var(np.concatenate([fA, fB]))
    S1 = np.zeros(d)
    ST = np.zeros(d)
    for i in range(d):
        fABi = Y[(2 + i) * n : (3 + i) * n]
        S1[i] = np.mean(fB * (fABi - fA)) / var
        ST[i] = 0.5 * np.mean((fA - fABi) ** 2) / var
    return S1, ST, var


def tokamak_chaos_qoi(n_turns: int = 30, nph: int = 32, r0: float = 0.2,
                      th0: float = 1.0):
    """QoI: radial excursion of a field line after ``n_turns`` turns as a
    function of (eps, phase) — measures island/chaos strength."""
    from sympgpr_tpu.systems import tokamak as tk

    def qoi(theta: Array) -> Array:
        eps, phase = theta[0], theta[1]
        # inline field-line integration with traced (eps, phase): replicate
        # tk.timestep with a traced-field variant
        dph = 2.0 * np.pi / nph
        pth0 = tk.Ath(r0, th0, 0.0)

        def aph_r(r, th, ph):
            pert = 1.0 + eps * jnp.cos(-3.0 * th + 2.0 * ph + phase)
            return -(r - r**3 / tk.A_MINOR**2) * pert

        def aph_th(r, th, ph):
            return ((r**2 / 2.0 - r**4 / (4.0 * tk.A_MINOR**2)) * (-3.0)
                    * eps * jnp.sin(-3.0 * th + 2.0 * ph + phase))

        def residual(znew, zold, rlast):
            mid = 0.5 * (zold[:2] + znew)
            ph = zold[2] + 0.5 * dph
            r = tk.compute_r(mid[0], mid[1], ph, rlast)
            dApdr = aph_r(r, mid[1], ph)
            dApdt = aph_th(r, mid[1], ph)
            dAtdr = tk.dAthdr(r, mid[1], ph)
            dAtdt = tk.dAthdth(r, mid[1], ph)
            y1 = zold[0] - znew[0] + dph * (dApdt - dApdr * dAtdt / dAtdr)
            y2 = zold[1] - znew[1] - dph * dApdr / dAtdr
            return jnp.array([y1, y2]), r

        def tstep(carry, _):
            z, rlast = carry
            jac = jax.jacfwd(lambda zn: residual(zn, z, rlast)[0])

            def nbody(_, zn):
                f, _ = residual(zn, z, rlast)
                return zn - jnp.linalg.solve(jac(zn), f)

            zn = jax.lax.fori_loop(0, 6, nbody, z[:2])
            _, r = residual(zn, z, rlast)
            znew = jnp.array([zn[0], zn[1], z[2] + dph])
            rr = tk.compute_r(zn[0], zn[1], znew[2], r)
            return (znew, r), rr

        z0 = jnp.array([pth0, th0, 0.0])
        (_, _), rs = jax.lax.scan(
            tstep, (z0, jnp.asarray(r0)), None, length=nph * n_turns
        )
        return jnp.max(rs) - jnp.min(rs)

    return qoi
