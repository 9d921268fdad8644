#!/usr/bin/env python
"""Round-4 TPU measurement probes (run standalone on the real chip).

Subcommands:
  peak      -- f32 3-pass matmul ceiling (the MFU denominator)
  stages    -- grad-step stage profile at n=2N: build / chol / triinv /
               syrk / contraction, plus whole-step and whole-eval
  rollout   -- rollout_in_kernel throughput vs training-set size N
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, reps=3):
    """Best-of-reps wall time; fn must end in a scalar host fetch."""
    fn(*args)  # compile + warm
    dt = np.inf
    for _ in range(reps):
        t0 = time.time()
        fn(*args)
        dt = min(dt, time.time() - t0)
    return dt


def scan_timed(fn, args, reps=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(c, _):
            return fn(c, *a), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c

    float(run(*args))
    dt = np.inf
    for _ in range(3):
        t0 = time.time()
        float(run(*args))
        dt = min(dt, time.time() - t0)
    return dt / reps


def cmd_peak(n=8192):
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(0)
    A = jax.random.normal(k, (n, n), jnp.float32)
    B = jax.random.normal(k, (n, n), jnp.float32)

    out = {}
    for prec in ("float32", "default", "bfloat16"):
        if prec == "bfloat16":
            Ax, Bx = A.astype(jnp.bfloat16), B.astype(jnp.bfloat16)
            p = "default"
        else:
            Ax, Bx, p = A, B, prec

        def mm(c, Ax, Bx):
            C = jax.lax.dot(Ax * (1 + 1e-30 * c), Bx, precision=p)
            return jnp.sum(C[::257, ::257]).astype(jnp.float32)

        dt = scan_timed(mm, (Ax, Bx), reps=4)
        out[f"matmul_{prec}_tflops"] = round(2 * n**3 / dt / 1e12, 2)
    print(json.dumps(out))


def cmd_stages(N=4096):
    import jax
    import jax.numpy as jnp

    from sympgpr_tpu.kernels import PER_SE
    from sympgpr_tpu.linalg.triangular import tri_inv_blocked
    from sympgpr_tpu.ops import pallas_cov
    from sympgpr_tpu.ops.pallas_syrk import syrk_lower
    from sympgpr_tpu.workloads import large_n

    X, z = large_n.synthetic_training_set(N, jnp.float32)
    p0 = jnp.asarray([0.35, 0.35], jnp.float32)
    sig = jnp.asarray(2.0, jnp.float32)
    s2n = jnp.asarray(1e-2, jnp.float32)
    n = 2 * N

    K = pallas_cov.build_K_pallas(PER_SE, X, X, p0, sig)
    Ky0 = K + s2n * jnp.eye(n, dtype=jnp.float32)
    L0 = jnp.linalg.cholesky(Ky0)
    L0.block_until_ready()

    out = {"N": N, "n": n}

    def chol(c, Ky):
        L = jnp.linalg.cholesky(Ky * (1 + 1e-30 * c))
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    out["chol_s"] = scan_timed(chol, (Ky0,))

    for base in (256, 512, 1024):
        def triinv(c, L):
            W = tri_inv_blocked(L * (1 + 1e-30 * c), base=base)
            return jnp.sum(W[::257, ::257])

        out[f"triinv_b{base}_s"] = scan_timed(triinv, (L0,))

    W0 = tri_inv_blocked(L0)
    W0.block_until_ready()
    for tile in (256, 512, 1024):
        def syrk(c, W):
            S = syrk_lower(W * (1 + 1e-30 * c), tile=tile)
            return jnp.sum(S[::257, ::257])

        try:
            out[f"syrk_t{tile}_s"] = scan_timed(syrk, (W0,))
        except Exception as e:
            out[f"syrk_t{tile}_s"] = f"{type(e).__name__}"

    # dense matmul W.T @ W comparison
    def densemm(c, W):
        S = jax.lax.dot(W.T * (1 + 1e-30 * c), W, precision="float32")
        return jnp.sum(S[::257, ::257])

    out["wtw_dense_s"] = scan_timed(densemm, (W0,))

    # contraction stage
    Kyinv0 = jax.lax.dot(W0.T, W0, precision="float32")
    alpha = jax.scipy.linalg.cho_solve((L0, True), z)
    Kbar0 = 0.5 * Kyinv0 - 0.5 * alpha[:, None] * alpha[None, :]

    def contract(c, Kbar):
        dp, ds = pallas_cov.cov_param_grads(
            PER_SE.name, X, X, p0 * (1 + 1e-30 * c), sig, Kbar)
        return jnp.sum(dp) + ds

    out["contract_s"] = scan_timed(contract, (Kbar0,))

    def build(c, p):
        Kb = pallas_cov.build_K_pallas(PER_SE, X, X, p * (1 + 1e-30 * c),
                                       sig)
        return jnp.sum(Kb[:, :: max(1, n // 64)])

    out["build_s"] = scan_timed(build, (p0,))

    for k in list(out):
        if isinstance(out[k], float):
            out[k] = round(out[k], 6)
    # reference rates
    out["chol_tflops"] = round(n**3 / 3 / out["chol_s"] / 1e12, 2)
    b = min(v for k, v in out.items()
            if k.startswith("triinv") and isinstance(v, float))
    out["triinv_best_tflops"] = round(2 * n**3 / 3 / b / 1e12, 2)
    s = min(v for k, v in out.items()
            if k.startswith("syrk") and isinstance(v, float))
    out["syrk_best_tflops"] = round(n**3 / 3 / s / 1e12, 2)
    out["wtw_dense_tflops"] = round(2 * n**3 / out["wtw_dense_s"] / 1e12, 2)
    print(json.dumps(out))


def cmd_rollout(Ns=(512, 1024, 2048, 4096), B=4096, nm=256):
    import jax
    import jax.numpy as jnp

    from sympgpr_tpu.ops import pallas_step as psk

    out = {"B": B, "nm": nm}
    rng = np.random.default_rng(0)
    for N in Ns:
        ns = psk._pad8(N)
        nas = psk._pad8(64)
        col = lambda v: jnp.asarray(
            np.asarray(v, np.float32).reshape(-1, 1))
        scal = np.zeros((1, psk.NSCAL), np.float32)
        scal[0, :6] = [0.6, 0.6, 0.6, 0.6, 1.0, 2 * np.pi]
        pm = psk.PackedModels(
            uq=col(rng.uniform(0, 2 * np.pi, ns)),
            uP=col(rng.uniform(-1, 1, ns)),
            a0=col(rng.normal(size=ns) / ns),
            a1=col(rng.normal(size=ns) / ns),
            auxq=col(rng.uniform(0, 2 * np.pi, nas)),
            auxp=col(rng.uniform(-1, 1, nas)),
            auxa=col(rng.normal(size=nas) / nas),
            scal=jnp.asarray(scal),
            kind=0, aux_kind=0, n_maps=1, ns=ns, nas=nas,
        )
        q0 = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
        p0 = jnp.asarray(rng.uniform(-1, 1, B), jnp.float32)

        def run():
            Q, P = psk.rollout_in_kernel(pm, q0, p0, nm)
            return float(jnp.nansum(Q[-1]))

        try:
            dt = timed(run)
            out[f"N{N}_steps_per_s"] = round((nm - 1) * B / dt, 1)
            out[f"N{N}_pair_steps_per_s"] = round(
                (nm - 1) * B * ns / dt / 1e9, 2)
        except Exception as e:
            out[f"N{N}_steps_per_s"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["peak", "stages", "rollout"])
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()
    import jax

    jax.config.update("jax_enable_x64", False)
    print(json.dumps({"device": str(jax.devices()[0])}))
    if args.cmd == "peak":
        cmd_peak(args.n or 8192)
    elif args.cmd == "stages":
        cmd_stages(args.n or 4096)
    elif args.cmd == "rollout":
        cmd_rollout()
