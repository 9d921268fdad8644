#!/usr/bin/env python
"""Round-4 second-wave probes: trimm-accelerated tri_inv, left_cholesky."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(N=4096):
    import jax

    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp

    from r4_probe import scan_timed  # noqa: E402 (tools dir on path)
    from sympgpr_tpu.kernels import PER_SE
    from sympgpr_tpu.linalg.cholesky import left_cholesky
    from sympgpr_tpu.linalg.triangular import tri_inv_blocked
    from sympgpr_tpu.ops import pallas_cov
    from sympgpr_tpu.workloads import large_n

    X, z = large_n.synthetic_training_set(N, jnp.float32)
    p0 = jnp.asarray([0.35, 0.35], jnp.float32)
    sig = jnp.asarray(2.0, jnp.float32)
    n = 2 * N
    K = pallas_cov.build_K_pallas(PER_SE, X, X, p0, sig)
    Ky = K + 1e-2 * jnp.eye(n, dtype=jnp.float32)
    L0 = jnp.linalg.cholesky(Ky)
    L0.block_until_ready()

    out = {"N": N, "n": n, "device": str(jax.devices()[0])}

    # --- tri_inv: XLA dots vs trimm kernels ---
    for trimm in (False, True):
        def triinv(c, L):
            W = tri_inv_blocked(L * (1 + 1e-30 * c), trimm=trimm)
            return jnp.sum(W[::257, ::257])

        out[f"triinv_trimm{int(trimm)}_s"] = round(
            scan_timed(triinv, (L0,), reps=6), 6)

    # parity of the two paths on device
    Wd = tri_inv_blocked(L0, trimm=False)
    Wt = tri_inv_blocked(L0, trimm=True)
    out["trimm_max_rel_diff"] = float(
        jnp.max(jnp.abs(Wt - Wd)) / jnp.max(jnp.abs(Wd)))

    # --- cholesky: XLA vs left-looking ---
    def xla(c, Ky):
        L = jnp.linalg.cholesky(Ky * (1 + 1e-30 * c))
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    out["chol_xla_s"] = round(scan_timed(xla, (Ky,), reps=4), 6)
    for b in (512, 1024):
        def left(c, Ky):
            L = left_cholesky(Ky * (1 + 1e-30 * c), block=b)
            return jnp.sum(jnp.log(jnp.diagonal(L)))

        try:
            out[f"chol_left_b{b}_s"] = round(
                scan_timed(left, (Ky,), reps=4), 6)
        except Exception as e:
            out[f"chol_left_b{b}_s"] = f"{type(e).__name__}"
    Ll = left_cholesky(Ky, block=512)
    out["left_finite"] = bool(jnp.all(jnp.isfinite(jnp.diagonal(Ll))))
    out["left_max_rel_diff"] = float(
        jnp.max(jnp.abs(jnp.tril(Ll) - L0)) / jnp.max(jnp.abs(L0)))
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
