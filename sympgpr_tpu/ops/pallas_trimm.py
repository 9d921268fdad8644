"""Pallas TPU kernel: batched matmul with one lower-triangular operand.

The recursive-doubling triangular inverse (``linalg/triangular.py``)
spends its flops in two batched products per level,

    BWa = B  @ Wa      (Wa = lower-triangular diagonal-block inverse)
    Wb  = -Wc @ BWa    (Wc = lower-triangular diagonal-block inverse)

where half of each triangular operand is structural zeros.  XLA's
``dot_general`` has no triangular structure, so it multiplies the zeros
too — 2 n^3/3 total flops where n^3/3 suffice.  This kernel skips the
zero k-tiles: for ``C = A @ L`` (L lower) tile (i, j) only accumulates
k >= j; for ``C = L @ A`` only k <= i.  Skipped grid steps clamp their
index maps to the block the pipeline already holds (same trick as
``pallas_syrk``), so they cost neither HBM traffic nor MXU work.

MAC count: n^3/6 per product (+O(1/nt) diagonal-tile slack) vs the n^3/2
XLA spends — the structural-zero saving on top of nothing else, exact to
f32 round-off (the skipped tiles contribute exactly zero).

Reference analog: none — the reference's ``inv`` is a dense LAPACK call
(``python/05_tokamak/SympGPR/main.py:52``); this exists purely for the
TPU speed-of-light budget (docs/DESIGN.md section 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE = 512


def _trimm_tile(a_ref, b_ref, o_ref, *, right: bool, precision):
    i, j, k = pl.program_id(1), pl.program_id(2), pl.program_id(3)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    act = (k >= j) if right else (k <= i)

    @pl.when(act)
    def _():
        o_ref[:, :, :] += jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=o_ref.dtype,
            precision=precision)[None]


@functools.partial(
    jax.jit, static_argnames=("right", "tile", "precision", "interpret"))
def _trimm_call(A: Array, B: Array, right: bool, tile: int,
                precision: str, interpret: bool) -> Array:
    nb, s, _ = A.shape
    if A.shape != B.shape:
        raise ValueError(f"trimm operands must match: {A.shape} vs {B.shape}")
    if s % tile != 0:
        # Without this the grid would under-cover the matrix and the
        # tail of the output buffer would be returned unwritten.
        raise ValueError(f"trimm size {s} not a multiple of tile {tile}")
    nt = s // tile
    kernel = functools.partial(_trimm_tile, right=right,
                               precision=precision)
    blk = lambda f: pl.BlockSpec((1, tile, tile), f,
                                 memory_space=pltpu.VMEM)
    if right:  # A @ L, L lower: k-tiles below j vanish
        a_map = lambda b, i, j, k: (b, i, jnp.maximum(k, j))
        b_map = lambda b, i, j, k: (b, jnp.maximum(k, j), j)
    else:      # L @ A, L lower: k-tiles above i vanish
        a_map = lambda b, i, j, k: (b, i, jnp.minimum(k, i))
        b_map = lambda b, i, j, k: (b, jnp.minimum(k, i), j)
    o_map = lambda b, i, j, k: (b, i, j)
    return pl.pallas_call(
        kernel,
        grid=(nb, nt, nt, nt),
        in_specs=[blk(a_map), blk(b_map)],
        out_specs=blk(o_map),
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        interpret=interpret,
    )(A, B)


def matmul_tril_right(
    A: Array, L: Array, tile: int = TILE, precision: str = "float32",
    interpret: bool | None = None,
) -> Array:
    """Batched ``A @ L`` with L lower-triangular: (nb, s, s) x (nb, s, s).

    Requires ``s % tile == 0`` (callers size their levels to tile
    multiples); upper tiles of L are never read, so L may carry garbage
    there.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _trimm_call(A, L, True, tile, precision, interpret)


def matmul_tril_left(
    L: Array, A: Array, tile: int = TILE, precision: str = "float32",
    interpret: bool | None = None,
) -> Array:
    """Batched ``L @ A`` with L lower-triangular."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _trimm_call(L, A, False, tile, precision, interpret)
