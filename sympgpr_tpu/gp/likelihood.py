"""Negative log marginal likelihood for the symplectic and auxiliary GPs.

Mirrors the reference's ``nll_chol`` / ``nll_chol_reg`` (Rasmussen & Williams
p.19 Cholesky form, ``python/01_pendulum/implicit/func.py:99-114``,
``python/05_tokamak/SympGPR/func.py:134-150``) including the
eigendecomposition fallback used when the Cholesky factorization fails at
indefinite hyperparameters (``func.py:104-114``).  In JAX a failed Cholesky
yields NaN rather than raising, so the fallback is a `lax.cond` on the
finiteness of the factor.  The fallback floors eigenvalues at a small positive
value so its value and gradient stay finite — strictly more robust than the
reference, which produces NaN for genuinely indefinite matrices.

Gradients of all objectives come from JAX autodiff — this replaces the
hand-built ``build_dK``/``nll_grad`` machinery (``python/functions/
func.py:52-162``) and fixes, by construction, the reference's copy-paste bug
where the sigma-component quadratic term reuses ``dK[1]``
(``python/05_tokamak/SympGPR/func.py:166``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.gp.covariance import build_K, build_K_fast, build_Kreg
from sympgpr_tpu.kernels.variants import Kernel

Array = jax.Array


def _nll_from_Ky(Ky: Array, z: Array) -> Array:
    """0.5 z^T Ky^{-1} z + 0.5 log det Ky (up to const), robustly."""
    L = jnp.linalg.cholesky(Ky)
    ok = jnp.all(jnp.isfinite(L))

    def chol_branch(_):
        alpha = jax.scipy.linalg.cho_solve((L, True), z)
        return 0.5 * z @ alpha + jnp.sum(jnp.log(jnp.diagonal(L)))

    def eig_branch(_):
        # Reference fallback: eigsh pseudo-inverse + pseudo-logdet
        # (python/01_pendulum/implicit/func.py:110-113).  We floor the
        # spectrum so value and gradient remain finite.
        w, Q = jnp.linalg.eigh(Ky)
        floor = jnp.maximum(jnp.max(jnp.abs(w)) * 1e-14, 1e-300)
        w = jnp.maximum(w, floor)
        alpha = Q @ ((Q.T @ z) / w)
        return 0.5 * z @ alpha + 0.5 * jnp.sum(jnp.log(w))

    return jax.lax.cond(ok, chol_branch, eig_branch, None)


def nll(
    kernel: Kernel,
    params: Array,
    sig: Array,
    sig2n: Array,
    X: Array,
    z: Array,
) -> Array:
    """NLL of the symplectic (derivative-observation) GP.

    X: (N, 2) mixed training points (q, P); z: (2N,) targets (p-P | Q-q).

    Above ``pallas_cov.nll_threshold()`` training points (f32 on an
    accelerator backend) the covariance is assembled by the Pallas tiled
    builder — shared transcendental factors per tile, no HBM temporaries;
    gradients flow through its custom VJP.  The dispatch is static (shapes
    and dtypes are trace-time constants).
    """
    from sympgpr_tpu.ops import pallas_cov

    if pallas_cov.want_pallas_build(kernel, X):
        K = pallas_cov.build_K_pallas(kernel, X, X, params, sig)
    else:
        K = build_K_fast(kernel, X, X, params, sig)
    Ky = K + jnp.abs(sig2n) * jnp.eye(K.shape[0], dtype=K.dtype)
    return _nll_from_Ky(Ky, z)


def nll_reg(
    kernel: Kernel,
    params: Array,
    sig: Array,
    sig2n: Array,
    X: Array,
    z: Array,
) -> Array:
    """NLL of the auxiliary ordinary GP. X: (N, 2) points (q, p); z: (N,)."""
    K = build_Kreg(kernel, X, X, params, sig)
    Ky = K + jnp.abs(sig2n) * jnp.eye(K.shape[0], dtype=K.dtype)
    return _nll_from_Ky(Ky, z)


def nll_separable(
    kernel: Kernel,
    params: Array,
    sig: Array,
    sig2n: Array,
    X: Array,
    z_block: Array,
    block: int,
) -> Array:
    """Per-block NLL for the separable (sum) kernel, explicit training.

    The reference trains lq and lp separately on the two diagonal blocks of
    the derivative covariance (``nll_expl``,
    ``python/04_standard_map/func.py:126-141``): block 0 is the (dq dq')
    block against z_p, block 1 the (dP dP') block against z_q.
    """
    K = build_K(kernel, X, X, params, sig)
    n = X.shape[0]
    sl = slice(0, n) if block == 0 else slice(n, 2 * n)
    Ky = K[sl, sl] + jnp.abs(sig2n) * jnp.eye(n, dtype=K.dtype)
    return _nll_from_Ky(Ky, z_block)


def _device_eye(n: int, dt) -> Array:
    """Identity built on device from iota.

    ``jnp.eye(n)`` inside a jit becomes an (n, n) *constant* — at n=8192
    that is a 268 MB literal shipped through the compile RPC on tunneled
    backends (measured: it overflows the request size limit outright).
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dt)


def nll_value_and_grad(
    kernel: Kernel,
    params: Array,
    sig: Array,
    sig2n: Array,
    X: Array,
    z: Array,
    *,
    precision: str = "float32",
) -> tuple[Array, Array, Array]:
    """(nll, d nll/d params, d nll/d sig) without autodiff through Cholesky.

    Reverse mode through ``jnp.linalg.cholesky`` + ``cho_solve`` costs two
    XLA n-rhs triangular solves that run at ~13 TF/s on this backend —
    137 ms of the 145 ms N=4096 training step (BENCH_r02, VERDICT round-2
    item 1).  This path uses the closed-form gradient the reference also
    uses (Rasmussen 5.9, ``python/functions/func.py:148-162``):

        d nll/d theta = <0.5 (Ky^{-1} - alpha alpha^T), dK/d theta>

    with Ky^{-1} assembled from MXU matmuls (blocked triangular inverse +
    Pallas syrk, ``linalg/triangular.py``) and the contraction fused into
    one Pallas tile pass that re-derives dK via ``jax.grad`` of the
    forward tile closure (``ops/pallas_cov.py::cov_param_grads``) — no dK
    matrices in HBM, unlike the reference's three ``build_dK`` buffers.

    Exactness: identical math to ``jax.value_and_grad(nll)`` (parity-tested
    in float64); in float32 both paths carry summation-order noise.
    ``sig2n`` is treated as fixed (the reference never optimizes it).
    """
    from sympgpr_tpu.ops import pallas_cov

    on_pallas = pallas_cov.want_pallas_build(kernel, X)
    if on_pallas:
        K = pallas_cov.build_K_pallas(kernel, X, X, params, sig)
    else:
        K = build_K_fast(kernel, X, X, params, sig)
    n = K.shape[0]
    Ky = K + jnp.abs(sig2n) * _device_eye(n, K.dtype)
    L = jnp.linalg.cholesky(Ky)
    alpha = jax.scipy.linalg.cho_solve((L, True), z)
    val = 0.5 * z @ alpha + jnp.sum(jnp.log(jnp.diagonal(L)))

    if jax.default_backend() == "cpu":
        Kyinv = jax.scipy.linalg.cho_solve((L, True), _device_eye(n, K.dtype))
    else:
        from sympgpr_tpu.linalg.triangular import spd_inverse_from_chol

        Kyinv = spd_inverse_from_chol(L, precision=precision)
    Kbar = 0.5 * Kyinv - 0.5 * alpha[:, None] * alpha[None, :]

    if on_pallas:
        dparams, dsig = pallas_cov.cov_param_grads(
            kernel.name, X, X, params, sig, Kbar)
    else:
        _, vjp = jax.vjp(
            lambda p, s: build_K_fast(kernel, X, X, p, s), params, sig)
        dparams, dsig = vjp(Kbar)
    return val, dparams, dsig


def nll_value_and_grad_theta(
    kernel: Kernel,
    theta: Array,
    sig2n: Array,
    X: Array,
    z: Array,
    *,
    precision: str = "float32",
) -> tuple[Array, Array]:
    """(value, grad) of theta -> nll(10**theta), closed-form gradient.

    theta = log10 (lengthscales..., sig) — the convention of every
    optimizer driver in ``gp/train.py``.
    """
    hyp = 10.0 ** theta
    params, sig = hyp[:-1], hyp[-1]
    val, dparams, dsig = nll_value_and_grad(
        kernel, params, sig, sig2n, X, z, precision=precision)
    ln10 = jnp.asarray(np.log(10.0), theta.dtype)
    dtheta = jnp.concatenate(
        [dparams * params, jnp.reshape(dsig * sig, (1,))]) * ln10
    return val, dtheta


def chol_and_alpha(
    Ky: Array, z: Array, max_jitter_tries: int = 6
) -> tuple[Array, Array]:
    """Cholesky factor and alpha = Ky^{-1} z (cached for prediction).

    The reference recomputes ``matmul(Kyinv, ztrain)`` inside every Newton
    residual evaluation (``python/05_tokamak/SympGPR/sympgpr.f90:121``); we
    hoist it here once per fitted model.

    If the factorization fails (optimized hyperparameters can leave Ky
    numerically semidefinite at the configured jitter), the jitter is
    escalated geometrically from ``1e-12 * max(diag)`` until it succeeds —
    the production-robust version of the reference's eigsh fallback.
    """
    L = jnp.linalg.cholesky(Ky)
    if bool(jnp.all(jnp.isfinite(L))):
        return L, jax.scipy.linalg.cho_solve((L, True), z)
    eye = jnp.eye(Ky.shape[0], dtype=Ky.dtype)
    jitter = 1e-12 * float(jnp.max(jnp.diagonal(Ky)))
    for _ in range(max_jitter_tries):
        L = jnp.linalg.cholesky(Ky + jitter * eye)
        if bool(jnp.all(jnp.isfinite(L))):
            return L, jax.scipy.linalg.cho_solve((L, True), z)
        jitter *= 100.0
    raise np.linalg.LinAlgError(
        "covariance not positive definite even after jitter escalation"
    )
