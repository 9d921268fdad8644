"""Hyperparameter inference drivers.

The reference optimizes its NLL with scipy L-BFGS-B over log10 hyperparameters
(finite-difference gradients in most drivers, analytic in 02:
``python/02_pert_pendulum/main.py:38,59``) and alternatively with CMA-ES
(``python/05_tokamak/Split_SympGPR/main.py:33-45``, via the external ``cma``
package).  Here:

* L-BFGS-B runs host-side (scipy) over a jitted JAX value_and_grad objective —
  exact gradients everywhere, the device does all the linear algebra.
* CMA-ES is implemented natively (no external dependency) with the whole
  population evaluated in one vmapped, jitted batch per generation — on TPU a
  generation costs one fused kernel launch.
* An optax Adam path is provided for fully on-device training loops (used by
  the distributed training step).
* HMC over hyperparameters (north-star capability; absent in the reference)
  lives in ``sympgpr_tpu.gp.hmc``.

Hyperparameter transforms mirror the reference's two styles: ``log10``
(``hyp = 10**theta``, most drivers) and ``linear`` (``hyp = theta`` with
``abs`` at read-out, tokamak symplectic GP, ``python/05_tokamak/SympGPR/
main.py:58-68``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.optimize

from sympgpr_tpu.gp import likelihood
from sympgpr_tpu.gp.model import AuxGP, SympGP
from sympgpr_tpu.kernels.variants import Kernel

Array = jax.Array

_BIG = 1e30


@dataclasses.dataclass
class FitResult:
    theta: np.ndarray
    fun: float
    success: bool
    nfev: int
    message: str = ""


def _apply_transform(theta: Array, transform: str) -> Array:
    if transform == "log10":
        return 10.0 ** theta
    if transform == "linear":
        return jnp.abs(theta)
    raise ValueError(f"unknown transform {transform!r}")


def make_objective(
    nll_fn: Callable[..., Array],
    kernel: Kernel,
    X: Array,
    z: Array,
    sig2n: float,
    *,
    transform: str = "log10",
    fixed_sig: float | None = None,
    **nll_kwargs,
) -> Callable[[Array], Array]:
    """Objective theta -> NLL.

    When ``fixed_sig`` is None the last component of theta is the signal
    variance (jointly optimized, tokamak style); otherwise theta holds only
    the kernel shape parameters and sig is fixed (the ``2*max|z|^2``
    heuristic of the pendulum/standard-map drivers,
    ``python/01_pendulum/implicit/main.py:127,144``).
    """

    def objective(theta: Array) -> Array:
        hyp = _apply_transform(theta, transform)
        if fixed_sig is None:
            params, sig = hyp[:-1], hyp[-1]
        else:
            params, sig = hyp, jnp.asarray(fixed_sig, dtype=theta.dtype)
        return nll_fn(kernel, params, sig, jnp.asarray(sig2n, theta.dtype), X,
                      z, **nll_kwargs)

    return objective


def minimize_lbfgs(
    objective: Callable[[Array], Array],
    x0: Sequence[float],
    bounds=None,
    tol: float | None = None,
    maxiter: int = 200,
) -> FitResult:
    """scipy L-BFGS-B over a jitted value_and_grad of the objective."""
    vg = jax.jit(jax.value_and_grad(objective))
    x0 = np.asarray(x0, dtype=np.float64)

    def fun(x):
        v, g = vg(jnp.asarray(x))
        v = float(np.nan_to_num(np.asarray(v), nan=_BIG, posinf=_BIG))
        g = np.nan_to_num(np.asarray(g, dtype=np.float64))
        return v, g

    res = scipy.optimize.minimize(
        fun, x0, jac=True, method="L-BFGS-B", bounds=bounds, tol=tol,
        options={"maxiter": maxiter},
    )
    return FitResult(theta=np.asarray(res.x), fun=float(res.fun),
                     success=bool(res.success), nfev=int(res.nfev),
                     message=str(res.message))


def minimize_cmaes(
    objective: Callable[[Array], Array],
    x0: Sequence[float],
    sigma0: float = 0.5,
    popsize: int | None = None,
    maxiter: int = 200,
    restarts: int = 0,
    seed: int = 0,
    tol_fun: float = 1e-11,
) -> FitResult:
    """Native CMA-ES (Hansen's standard (mu/mu_w, lambda) strategy).

    Population NLL evaluations are batched through one jitted vmap per
    generation.  Restarts double the population (IPOP), mirroring
    ``cma.fmin(..., restarts=...)`` usage in the Split driver.
    """
    x0 = np.asarray(x0, dtype=np.float64)
    n = x0.size
    batch_obj = jax.jit(jax.vmap(objective))

    best_x, best_f, total_fev = x0.copy(), np.inf, 0
    lam0 = popsize or (4 + int(3 * np.log(n)))
    rng = np.random.default_rng(seed)

    for restart in range(restarts + 1):
        lam = lam0 * (2**restart)
        mu = lam // 2
        w = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
        w /= w.sum()
        mueff = 1.0 / np.sum(w**2)
        cc = (4 + mueff / n) / (n + 4 + 2 * mueff / n)
        cs = (mueff + 2) / (n + mueff + 5)
        c1 = 2 / ((n + 1.3) ** 2 + mueff)
        cmu = min(1 - c1, 2 * (mueff - 2 + 1 / mueff) / ((n + 2) ** 2 + mueff))
        damps = 1 + 2 * max(0.0, np.sqrt((mueff - 1) / (n + 1)) - 1) + cs
        chiN = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n**2))

        xmean = x0.copy() if restart == 0 else best_x.copy()
        sigma = sigma0
        pc = np.zeros(n)
        ps = np.zeros(n)
        B = np.eye(n)
        D = np.ones(n)
        C = np.eye(n)
        eigeneval = 0
        counteval = 0

        prev_best = np.inf
        for it in range(maxiter):
            arz = rng.standard_normal((lam, n))
            ary = arz @ (B * D).T
            arx = xmean + sigma * ary
            f = np.asarray(batch_obj(jnp.asarray(arx)), dtype=np.float64)
            f = np.nan_to_num(f, nan=_BIG, posinf=_BIG)
            counteval += lam
            total_fev += lam
            idx = np.argsort(f)
            if f[idx[0]] < best_f:
                best_f = float(f[idx[0]])
                best_x = arx[idx[0]].copy()

            xold = xmean
            xmean = w @ arx[idx[:mu]]
            zmean = w @ arz[idx[:mu]]

            ps = (1 - cs) * ps + np.sqrt(cs * (2 - cs) * mueff) * (B @ zmean)
            hsig = (
                np.linalg.norm(ps)
                / np.sqrt(1 - (1 - cs) ** (2 * counteval / lam)) / chiN
                < 1.4 + 2 / (n + 1)
            )
            pc = (1 - cc) * pc + hsig * np.sqrt(cc * (2 - cc) * mueff) * (
                (xmean - xold) / sigma
            )
            artmp = (arx[idx[:mu]] - xold) / sigma
            C = (
                (1 - c1 - cmu) * C
                + c1 * (np.outer(pc, pc) + (1 - hsig) * cc * (2 - cc) * C)
                + cmu * (artmp.T * w) @ artmp
            )
            sigma *= np.exp((cs / damps) * (np.linalg.norm(ps) / chiN - 1))

            if counteval - eigeneval > lam / (c1 + cmu) / n / 10:
                eigeneval = counteval
                C = np.triu(C) + np.triu(C, 1).T
                Dsq, B = np.linalg.eigh(C)
                D = np.sqrt(np.maximum(Dsq, 1e-20))

            if abs(prev_best - f[idx[0]]) < tol_fun and it > 10:
                break
            prev_best = f[idx[0]]

    return FitResult(theta=best_x, fun=best_f, success=np.isfinite(best_f),
                     nfev=total_fev, message="cma-es")


def minimize_adam(
    objective: Callable[[Array], Array],
    x0: Sequence[float],
    lr: float = 3e-2,
    steps: int = 300,
) -> FitResult:
    """Fully on-device Adam loop (lax.scan) — one jit, no host round-trips."""
    opt = optax.adam(lr)
    theta0 = jnp.asarray(np.asarray(x0, dtype=np.float64))
    vg = jax.value_and_grad(objective)

    @jax.jit
    def run(theta):
        state = opt.init(theta)

        def step(carry, _):
            theta, state = carry
            v, g = vg(theta)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, state = opt.update(g, state, theta)
            return (optax.apply_updates(theta, updates), state), v

        (theta, _), vals = jax.lax.scan(step, (theta, state), None,
                                        length=steps)
        return theta, vals

    theta, vals = run(theta0)
    final = float(objective(theta))
    return FitResult(theta=np.asarray(theta), fun=final,
                     success=bool(np.isfinite(final)), nfev=steps)


_MINIMIZERS = {
    "lbfgs": minimize_lbfgs,
    "cmaes": minimize_cmaes,
    "adam": minimize_adam,
}


def fit_sympgp(
    kernel: Kernel,
    X: Array,
    z: Array,
    *,
    sig2n: float,
    x0: Sequence[float],
    fixed_sig: float | None = None,
    transform: str = "log10",
    optimizer: str = "lbfgs",
    bounds=None,
    tol: float | None = None,
    **opt_kwargs,
) -> tuple[SympGP, FitResult]:
    """Fit the symplectic GP: optimize hyp, then build alpha/L."""
    objective = make_objective(
        likelihood.nll, kernel, X, z, sig2n,
        transform=transform, fixed_sig=fixed_sig,
    )
    if optimizer == "lbfgs":
        res = minimize_lbfgs(objective, x0, bounds=bounds, tol=tol,
                             **opt_kwargs)
    else:
        res = _MINIMIZERS[optimizer](objective, x0, **opt_kwargs)
    hyp = np.asarray(_apply_transform(jnp.asarray(res.theta), transform))
    if fixed_sig is None:
        params, sig = hyp[:-1], hyp[-1]
    else:
        params, sig = hyp, fixed_sig
    model = SympGP.create(kernel, params, sig, sig2n, X, z)
    return model, res


def fit_sympgp_ondevice(
    kernel: Kernel,
    X: Array,
    z: Array,
    *,
    sig2n: float,
    theta0: Sequence[float] = (0.5, 2.5, 2.0),
    steps: int = 60,
    lr: float = 5e-2,
    max_jitter_tries: int = 7,
):
    """Large-N on-device fit: one jitted Adam scan over the closed-form
    ``nll_value_and_grad_theta`` (Pallas covariance tiles + MXU Cholesky
    on TPU; a single dispatch and device->host fetch for the whole run),
    then the alpha solve at the trained hyperparameters.

    This is the single-chip large-N training API — the scaled-up
    counterpart of ``fit_sympgp`` (whose scipy L-BFGS loop round-trips
    the host every evaluation; fine at the reference's N <= 80, wasteful
    at N in the thousands) and the single-chip sibling of the
    distributed ``distributed.large.fit_large``.  Powers
    ``workloads/tokamak_large.py``; measured v5e numbers in DESIGN.md
    section 3 (N=8192: 60 steps in 14.3 s of compute over a 16384^2 f32
    covariance).

    Jitter escalation (the large-N analog of the reference's eigsh
    fallback, ``python/01_pendulum/implicit/func.py:104-114``): the f32
    Cholesky inside the closed-form gradient goes indefinite when
    ``sig2n`` is too small for the conditioning at this N (measured:
    tokamak N=4096 trains at 1e-2 but NaNs at 1e-3) — a non-finite
    final NLL triggers a refit at 10x the jitter, recorded in the
    returned timings as ``sig2n_used``/``jitter_escalations``.

    Returns ``(model, nll_history, train_mse, timings)`` where timings
    carries the compile/run split of the training scan.
    """
    import time as _time

    from sympgpr_tpu.gp.likelihood import nll_value_and_grad_theta
    from sympgpr_tpu.ops import pallas_cov

    dtype = X.dtype
    theta0 = jnp.asarray(np.log10(np.asarray(theta0)), dtype)
    opt = optax.adam(lr)

    @jax.jit
    def train(theta, s2n):
        def body(carry, _):
            th, st = carry
            v, g = nll_value_and_grad_theta(kernel, th, s2n, X, z)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            upd, st = opt.update(g, st, th)
            return (optax.apply_updates(th, upd), st), v

        (th, _), hist = jax.lax.scan(body, (theta, opt.init(theta)), None,
                                     length=steps)
        return th, hist

    escalations = 0
    t0 = _time.time()
    while True:
        s2n = jnp.asarray(sig2n, dtype)
        theta, hist = train(theta0, s2n)
        hist = np.asarray(hist)  # fetch = sync
        if np.isfinite(hist[-1]) or escalations >= max_jitter_tries:
            break
        sig2n *= 10.0
        escalations += 1
    t_total = _time.time() - t0
    t0 = _time.time()
    _, h2 = train(theta0, s2n)
    float(h2[-1])
    t_run = _time.time() - t0

    hyp = 10.0 ** theta
    params, sig = hyp[:-1], hyp[-1]
    n = X.shape[0]
    if pallas_cov.want_pallas_build(kernel, X):
        K = pallas_cov.build_K_pallas(kernel, X, X, params, sig)
    else:
        from sympgpr_tpu.gp.covariance import build_K_fast

        K = build_K_fast(kernel, X, X, params, sig)
    Ky = K + s2n * jnp.eye(2 * n, dtype=dtype)
    L = jnp.linalg.cholesky(Ky)
    alpha = jax.scipy.linalg.cho_solve((L, True), z)
    model = SympGP.from_alpha(kernel, params, sig, s2n, X, z, alpha)
    # training MSE from the already-built K (SympGP.training_error would
    # rebuild it through the vmapped-autodiff reference builder, which is
    # an O(N^2) Hessian trace never meant for N in the thousands)
    train_mse = float(jnp.mean((K @ alpha - z) ** 2))
    timings = {"fit_s": round(t_total, 3), "fit_run_s": round(t_run, 3),
               "fit_compile_s": round(t_total - t_run, 3),
               "sig2n_used": float(sig2n),
               "jitter_escalations": escalations}
    return model, hist, train_mse, timings


def fit_auxgp(
    kernel: Kernel,
    X: Array,
    z: Array,
    *,
    sig2n: float,
    x0: Sequence[float],
    fixed_sig: float | None = None,
    transform: str = "log10",
    optimizer: str = "lbfgs",
    bounds=None,
    delta: bool = True,
    nll_sig2n: float | None = None,
    **opt_kwargs,
) -> tuple[AuxGP, FitResult]:
    """Fit the auxiliary ordinary GP (Newton initial-guess regression).

    ``nll_sig2n`` lets the optimization use a different noise level than the
    final solve, matching e.g. ``python/05_tokamak/SympGPR/main.py:40`` (1e-8
    during optimization) vs line 52 (1e-14 in the final inverse).
    """
    objective = make_objective(
        likelihood.nll_reg, kernel, X, z,
        sig2n if nll_sig2n is None else nll_sig2n,
        transform=transform, fixed_sig=fixed_sig,
    )
    if optimizer == "lbfgs":
        res = minimize_lbfgs(objective, x0, bounds=bounds, **opt_kwargs)
    else:
        res = _MINIMIZERS[optimizer](objective, x0, **opt_kwargs)
    hyp = np.asarray(_apply_transform(jnp.asarray(res.theta), transform))
    if fixed_sig is None:
        params, sig = hyp[:-1], hyp[-1]
    else:
        params, sig = hyp, fixed_sig
    model = AuxGP.create(kernel, params, sig, sig2n, X, z, delta=delta)
    return model, res


def fit_sympgp_separable(
    kernel: Kernel,
    X: Array,
    z: Array,
    *,
    sig2n: float,
    nll_sig2n: float | None = None,
    x0_q: Sequence[float] = (1.0,),
    x0_p: Sequence[float] = (1.0,),
    fixed_sig: float,
    transform: str = "log10",
    bounds=None,
) -> tuple[SympGP, tuple[FitResult, FitResult]]:
    """Explicit-map training: lq and lp fitted separately on the two diagonal
    blocks (``python/04_standard_map/main.py:163-164``)."""
    n = X.shape[0]
    zp, zq = z[:n], z[n:]
    s2 = sig2n if nll_sig2n is None else nll_sig2n

    def make(block, zb):
        def objective(theta):
            l = _apply_transform(theta, transform)[0]
            # For a sum kernel, diagonal block `block` depends only on its
            # own lengthscale; the other component is set to 1 (any finite
            # value) to keep the unused addend's derivatives finite.
            one = jnp.ones((), dtype=l.dtype)
            params = jnp.array([l, one]) if block == 0 else jnp.array([one, l])
            return likelihood.nll_separable(
                kernel, params, jnp.asarray(fixed_sig, l.dtype),
                jnp.asarray(s2, l.dtype), X, zb, block,
            )
        return objective

    res_q = minimize_lbfgs(make(0, zp), x0_q, bounds=bounds)
    res_p = minimize_lbfgs(make(1, zq), x0_p, bounds=bounds)
    # .reshape(()) first: float() of a 1-element ndim>0 array is a numpy
    # deprecation slated to become an error
    lq = float(np.abs(np.asarray(
        _apply_transform(jnp.asarray(res_q.theta), transform))).reshape(()))
    lp = float(np.abs(np.asarray(
        _apply_transform(jnp.asarray(res_p.theta), transform))).reshape(()))
    model = SympGP.create(kernel, np.array([lq, lp]), fixed_sig, sig2n, X, z)
    return model, (res_q, res_p)


def fit_batch_adam(
    kernel: Kernel,
    Xs: Array,
    zs: Array,
    *,
    sig2n: float,
    x0: Sequence[float],
    transform: str = "log10",
    lr: float = 3e-2,
    steps: int = 300,
    nll_fn=None,
) -> tuple[Array, Array]:
    """Fit many GPs at once: vmapped Adam over stacked datasets.

    Xs: (M, N, 2) stacked training sets; zs: (M, 2N) (or (M, N) with
    ``nll_fn=likelihood.nll_reg``).  Returns (thetas (M, d), nlls (M,)).
    One fused program trains all M models — this is how the Split tokamak
    sub-maps or a sensitivity sweep of fits should run on TPU (SURVEY.md
    §7.3 item 7: "batched fits").
    """
    nll_fn = nll_fn or likelihood.nll
    theta0 = jnp.asarray(np.asarray(x0, dtype=np.float64))
    opt = optax.adam(lr)

    def loss(theta, X, z):
        hyp = _apply_transform(theta, transform)
        return nll_fn(kernel, hyp[:-1], hyp[-1],
                      jnp.asarray(sig2n, theta.dtype), X, z)

    def one(X, z):
        state = opt.init(theta0)

        def body(carry, _):
            theta, state = carry
            v, g = jax.value_and_grad(loss)(theta, X, z)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            upd, state = opt.update(g, state, theta)
            return (optax.apply_updates(theta, upd), state), v

        (theta, _), vals = jax.lax.scan(body, (theta0, state), None,
                                        length=steps)
        return theta, loss(theta, X, z)

    thetas, nlls = jax.jit(jax.vmap(one))(jnp.asarray(Xs), jnp.asarray(zs))
    return thetas, nlls
