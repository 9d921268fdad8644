"""Blocked lower-triangular inversion and symmetric rank-k products.

Why this exists: the hyperparameter gradient of the GP NLL needs
``Kbar = 0.5 (Ky^{-1} - alpha alpha^T)`` (Rasmussen & Williams 5.9 — the
reference builds the same quantity through an *explicit* ``inv`` at
``python/05_tokamak/SympGPR/main.py:52,78``).  On this TPU backend XLA's
``triangular_solve`` with n right-hand sides runs at ~13 TF/s (measured
v5e, n=8192) because its internal blocking keeps the MXU starved, and the
stock Cholesky VJP pays that price twice — 137 ms of a 145 ms training
step at N=4096.  The same inverse assembled from MXU matmuls:

* ``tri_inv_blocked`` — W = L^{-1} by batched recursive doubling:
  invert all ``base``-sized diagonal blocks in one vmapped call, then
  combine pairs level by level with ``Wb = -Wc (B Wa)`` (two batched
  matmuls per level).  Total ~(2/3) n^3 flops, all MXU.  Measured
  n=8192 f32 on v5e: 18.3 ms = 20 TF/s effective (the round-3 version
  spent an extra ~28 ms in Wv[p, :, p, :] gather/scatter HLO between
  levels; superblocks now stay a batched (npair, 2s, 2s) stack and
  block extraction is strided slicing — round-4 stage probes).
* ``Ky^{-1} = W^T W`` — a syrk; the Pallas tiled version that skips the
  zero upper triangle of W lives in ``ops/pallas_syrk.py`` (n^3/3 MACs
  instead of the n^3 a dense XLA matmul spends; 14.6 ms vs 37.5 ms
  dense at n=8192).

``precision`` selects the MXU pass count for f32 inputs: ``"float32"``
(3-pass, ~27 TF/s on v5e, rel err ~1e-7) or ``"default"`` (1-pass bf16,
~87 TF/s, rel err ~2e-3) — gradient consumers that tolerate noise can
opt into the fast path explicitly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _pad_tri(L: Array, m: int) -> Array:
    """Pad a lower-triangular factor to (m, m) with an identity tail.

    inv(diag(L, I)) = diag(inv(L), I), so slicing back [:n, :n] is exact.
    """
    n = L.shape[0]
    if m == n:
        return L
    Lp = jnp.pad(L, ((0, m - n), (0, m - n)))
    tail = jnp.arange(n, m)
    return Lp.at[tail, tail].set(jnp.asarray(1.0, L.dtype))


@partial(jax.jit,
         static_argnames=("base", "precision", "trimm", "trimm_tile"))
def tri_inv_blocked(
    L: Array, base: int = 512, precision: str = "float32",
    trimm: bool | None = None, trimm_tile: int | None = None,
) -> Array:
    """W = L^{-1} for lower-triangular L via batched recursive doubling.

    Sizes are identity-padded to ``base * 2**k``; the result is sliced
    back.  All heavy work is batched matmuls at the requested precision;
    only the ``base``-block diagonal inverses use ``triangular_solve``
    (one vmapped call over all blocks).

    ``trimm`` routes the combine matmuls through the triangular-aware
    Pallas kernel (``ops/pallas_trimm.py``): Wa/Wc are lower-triangular,
    so half of each product's MACs hit structural zeros that XLA's dense
    ``dot_general`` cannot skip.  Default (None): on for accelerator
    backends when the level span is a tile multiple; forced True runs
    the kernels in interpret mode on CPU (tests).
    """
    n_in = L.shape[0]
    base = min(base, max(8, 1 << (n_in - 1).bit_length()))
    m = base
    while m < n_in:
        m *= 2
    L = _pad_tri(L, m)
    dt = L.dtype
    nb = m // base

    # --- leaves: all diagonal base-blocks inverted in one batched call.
    # Static slices + stack, NOT advanced indexing: the round-3 version
    # extracted diagonal superblocks with Wv[p, :, p, :] gathers and
    # scattered results back onto a full (m, m) W every level, which cost
    # ~28 ms of gather/scatter HLO at n=8192 on top of ~15 ms of matmuls
    # (round-4 stage probes).  This version keeps W as the stack of
    # diagonal superblocks (npair, 2s, 2s) between levels — block
    # extraction is a strided batch slice and assembly is concatenation.
    diag = jnp.stack([
        jax.lax.slice(L, (i * base, i * base),
                      ((i + 1) * base, (i + 1) * base))
        for i in range(nb)
    ])
    eye = jnp.eye(base, dtype=dt)
    W = jax.vmap(
        lambda A: jax.scipy.linalg.solve_triangular(A, eye, lower=True)
    )(diag)  # (nb, base, base)

    if trimm is None:
        # pallas_trimm is a Mosaic (pallas.tpu) kernel: default it on
        # only for the TPU backend; other accelerators take the dense
        # dot_general branch rather than failing to lower.
        trimm = jax.default_backend() == "tpu"
    from sympgpr_tpu.ops.pallas_trimm import (
        TILE as _DEFAULT_TILE,
        matmul_tril_left,
        matmul_tril_right,
    )

    TRIMM_TILE = trimm_tile or _DEFAULT_TILE

    # --- combine levels: span s doubles until it covers the matrix ---
    s = base
    while s < m:
        npair = m // (2 * s)
        Wa = W[0::2]  # (npair, s, s)
        Wc = W[1::2]
        B = jnp.stack([
            jax.lax.slice(L, (2 * p * s + s, 2 * p * s),
                          (2 * (p + 1) * s, 2 * p * s + s))
            for p in range(npair)
        ])  # (npair, s, s) subdiagonal L blocks
        if trimm and s % TRIMM_TILE == 0:
            BWa = matmul_tril_right(B, Wa, tile=TRIMM_TILE,
                                    precision=precision)
            Wb = -matmul_tril_left(Wc, BWa, tile=TRIMM_TILE,
                                   precision=precision)
        else:
            BWa = jax.lax.dot_general(
                B, Wa, (((2,), (1,)), ((0,), (0,))), precision=precision)
            Wb = -jax.lax.dot_general(
                Wc, BWa, (((2,), (1,)), ((0,), (0,))),
                precision=precision)
        zero = jnp.zeros((npair, s, s), dt)
        W = jnp.concatenate([
            jnp.concatenate([Wa, zero], axis=2),
            jnp.concatenate([Wb, Wc], axis=2),
        ], axis=1)  # (npair, 2s, 2s)
        s *= 2

    return W[0][:n_in, :n_in]


def spd_inverse_from_chol(
    L: Array, base: int = 512, precision: str = "float32",
    syrk: bool = True,
) -> Array:
    """Ky^{-1} from its Cholesky factor: W = L^{-1}, then W^T W.

    ``syrk=True`` uses the Pallas lower-triangle syrk on an accelerator
    backend (n^3/3 MACs); otherwise (or on CPU) a dense XLA matmul.
    """
    W = tri_inv_blocked(L, base=base, precision=precision)
    if syrk and jax.default_backend() == "tpu":
        from sympgpr_tpu.ops.pallas_syrk import syrk_lower

        return syrk_lower(W, precision=precision)
    return jax.lax.dot(W.T, W, precision=precision)
