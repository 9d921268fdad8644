"""Pallas TPU kernel: W^T W for a lower-triangular W (syrk).

XLA has no syrk primitive — ``W.T @ W`` spends 2 n^3 flops even though
half of W is zeros and the result is symmetric.  This kernel computes
only the lower tiles of ``S = W^T W`` and, within each tile (i, j), only
accumulates k-tiles with ``k >= i`` (W[k-tile, i-tile] is zero below the
diagonal... above it — W is lower-triangular, so the (k, i) block
vanishes for k < i).  MAC count is n^3/3·(1 + O(1/nb)) of the dense
matmul's n^3, i.e. the classic syrk saving plus the triangular-operand
saving.

Used by ``linalg.triangular.spd_inverse_from_chol`` to assemble
``Ky^{-1} = W^T W`` for the manual NLL gradient (the contraction
``<0.5 Ky^{-1} - 0.5 alpha alpha^T, dK/dtheta>`` in
``ops/pallas_cov.py``); the reference's analog is the explicit
``inv(K + sig2n I)`` at ``python/05_tokamak/SympGPR/main.py:52,78``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE = 512


def _syrk_tile(a_ref, b_ref, o_ref, *, precision):
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    # zero-init gated on j <= i: under the clamped index maps below the
    # o_ref buffer of a skipped (j > i) program IS the already-computed
    # (i, i) tile — an unconditional init would wipe it before write-back
    @pl.when((k == 0) & (j <= i))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # lower output tiles only; skip k-tiles where the W block is zero
    @pl.when((j <= i) & (k >= i))
    def _():
        o_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=o_ref.dtype, precision=precision)


@functools.partial(
    jax.jit, static_argnames=("tile", "precision", "interpret"))
def _syrk_call(W: Array, tile: int, precision: str, interpret: bool):
    n = W.shape[0]
    nt = n // tile
    kernel = functools.partial(_syrk_tile, precision=precision)
    blk = lambda f: pl.BlockSpec((tile, tile), f, memory_space=pltpu.VMEM)

    # Clamped index maps: the Pallas pipeline fetches every grid step's
    # blocks from HBM even when the kernel body is a no-op, so the naive
    # (k, i)/(k, j)/(i, j) maps paid ~2/3 of the grid in dead traffic
    # (~10 ms of the 23.6 ms round-3 syrk at n=8192).  Skipped steps
    # (j > i, or k < i where the W block is zero) are clamped to the
    # block the pipeline already holds — consecutive equal indices fetch
    # nothing — cutting HBM reads to the ~nt^3/6 active tiles.
    def a_map(i, j, k):
        act = j <= i
        return (jnp.where(act, jnp.maximum(k, i), i), i)

    def b_map(i, j, k):
        act = j <= i
        return (jnp.where(act, jnp.maximum(k, i), i),
                jnp.where(act, j, i))

    def o_map(i, j, k):
        return (i, jnp.minimum(j, i))

    return pl.pallas_call(
        kernel,
        grid=(nt, nt, nt),
        in_specs=[blk(a_map), blk(b_map)],
        out_specs=blk(o_map),
        out_shape=jax.ShapeDtypeStruct((n, n), W.dtype),
        interpret=interpret,
    )(W, W)


# Round-5 note: a syrk-UPDATE kernel (C[lower trailing tiles] -=
# panel @ panel^T with a dynamic shrinking grid, scalar-prefetched step
# index, and C aliased in place) was built here to power a third blocked
# Cholesky attempt.  It validated in interpret mode and compiled on
# hardware, but the factorization measured 29.1 ms vs XLA's 16.5 ms at
# n=8192 (per-step latency dominates; full account in
# ``linalg/cholesky.py``) and was deleted with its caller.


def syrk_lower(
    W: Array, tile: int = TILE, precision: str = "float32",
    interpret: bool | None = None,
) -> Array:
    """Full symmetric S = W^T W for lower-triangular W.

    W is zero-padded to a tile multiple (zero rows/cols contribute
    nothing); the strict upper triangle is mirrored from the computed
    lower tiles in one bandwidth-bound XLA pass.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = W.shape[0]
    tile = min(tile, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        W = jnp.pad(W, ((0, n_pad - n), (0, n_pad - n)))
    S = _syrk_call(W, tile, precision, interpret)
    S = jnp.tril(S)
    S = S + jnp.tril(S, -1).T
    return S[:n, :n]
