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

    @pl.when(k == 0)
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
    return pl.pallas_call(
        kernel,
        grid=(nt, nt, nt),
        in_specs=[blk(lambda i, j, k: (k, i)), blk(lambda i, j, k: (k, j))],
        out_specs=blk(lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, n), W.dtype),
        interpret=interpret,
    )(W, W)


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
