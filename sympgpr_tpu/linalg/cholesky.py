"""Blocked and distributed Cholesky factorization.

The reference factorizes on one CPU through scipy/LAPACK
(``python/01_pendulum/implicit/func.py:105``).  For covariance matrices that
outgrow one chip's HBM or one core's throughput, this module provides:

* ``blocked_cholesky`` — single-device right-looking blocked algorithm
  (panel Cholesky + triangular solve + SPD trailing update); the trailing
  update is a matmul and runs on the MXU, unlike the mostly-sequential
  stock Cholesky.
* ``distributed_cholesky`` — the same algorithm with block rows distributed
  cyclically over a mesh axis via `shard_map`: the diagonal block is
  combined with a masked `psum` (broadcast over ICI), every device
  factorizes the small diagonal block redundantly, panels are solved
  locally, and the panel column is `all_gather`-ed for the trailing update
  (the BASELINE.json "block allreduce/broadcast collectives over ICI"
  north star).

Both paths are exact (no iterative refinement needed) and are validated
against ``jnp.linalg.cholesky`` on the 8-device CPU mesh in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Array = jax.Array


def _chol_small(A: Array) -> Array:
    return jnp.linalg.cholesky(A)


@partial(jax.jit, static_argnames=("block",))
def blocked_cholesky(K: Array, block: int = 256) -> Array:
    """Lower Cholesky factor of SPD K via right-looking blocked updates."""
    n = K.shape[0]
    if n % block != 0:
        raise ValueError(f"matrix size {n} must be divisible by {block}")
    nb = n // block
    A = K

    for k in range(nb):
        sl_k = slice(k * block, (k + 1) * block)
        Akk = jax.lax.dynamic_slice(A, (k * block, k * block),
                                    (block, block))
        Lkk = _chol_small(Akk)
        A = jax.lax.dynamic_update_slice(A, Lkk, (k * block, k * block))
        if k + 1 < nb:
            rest = n - (k + 1) * block
            Apanel = jax.lax.dynamic_slice(
                A, ((k + 1) * block, k * block), (rest, block))
            # L_ik = A_ik L_kk^{-T}
            Lpanel = jax.scipy.linalg.solve_triangular(
                Lkk, Apanel.T, lower=True).T
            A = jax.lax.dynamic_update_slice(
                A, Lpanel, ((k + 1) * block, k * block))
            At = jax.lax.dynamic_slice(
                A, ((k + 1) * block, (k + 1) * block), (rest, rest))
            At = At - Lpanel @ Lpanel.T  # MXU
            A = jax.lax.dynamic_update_slice(
                A, At, ((k + 1) * block, (k + 1) * block))
    return jnp.tril(A)


def distributed_cholesky(
    K: Array, mesh: Mesh, axis: str = "kp", block: int | None = None
) -> Array:
    """Lower Cholesky factor with block rows cyclic over ``axis``.

    K: (n, n) replicated input; returns the replicated factor L.  The
    factorization itself runs with each device owning n/(D*block) block
    rows; only O(nb) small collectives (psum of the diagonal block,
    all_gather of the panel column) cross the interconnect per step.
    """
    n = K.shape[0]
    D = mesh.shape[axis]
    if block is None:
        block = max(8, n // (4 * D))
    nb = n // block
    if n % block or nb % D:
        raise ValueError(
            f"need n % block == 0 and (n/block) % D == 0; "
            f"n={n} block={block} D={D}"
        )
    nb_loc = nb // D

    # scatter rows cyclically: local[li] = K[block rows (li*D + d)]
    def to_cyclic(K):
        blocks = K.reshape(nb, block, n)
        return blocks.reshape(nb_loc, D, block, n).transpose(1, 0, 2, 3)

    Kc = to_cyclic(K)  # (D, nb_loc, block, n)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(axis, None, None, None),
        out_specs=P(axis, None, None, None),
        check_vma=False,
    )
    def factorize(local):  # local: (1, nb_loc, block, n) on each device
        local = local[0]
        d = jax.lax.axis_index(axis)
        gidx = jnp.arange(nb_loc) * D + d  # global block-row ids

        for k in range(nb):
            owner = k % D
            lk = k // D
            # -- broadcast current diagonal block (masked psum) --
            mine = jnp.where(d == owner, 1.0, 0.0)
            Akk = jax.lax.psum(
                mine * jax.lax.dynamic_slice(
                    local, (lk, 0, k * block), (1, block, block))[0],
                axis,
            )
            Lkk = _chol_small(Akk)
            # -- local panel solves (rows i >= k; row k gets Lkk) --
            cols = jax.lax.dynamic_slice(
                local, (0, 0, k * block), (nb_loc, block, block))
            solved = jax.vmap(
                lambda Aik: jax.scipy.linalg.solve_triangular(
                    Lkk, Aik.T, lower=True).T
            )(cols)
            is_diag = (gidx == k)[:, None, None]
            below = (gidx > k)[:, None, None]
            newcols = jnp.where(
                is_diag, Lkk[None], jnp.where(below, solved, cols)
            )
            local = jax.lax.dynamic_update_slice(
                local, newcols, (0, 0, k * block))
            # -- gather the full panel column for the trailing update --
            panel_cyc = jax.lax.all_gather(
                jnp.where((gidx >= k)[:, None, None], newcols, 0.0),
                axis, axis=0,
            )  # (D, nb_loc, block, block) cyclic layout
            panel = panel_cyc.transpose(1, 0, 2, 3).reshape(nb, block, block)
            # trailing update of local rows i > k, columns k+1..n:
            # A_i,: -= L_ik @ Lpanel_row^T  restricted to cols j in (k, i]
            Lik = newcols  # (nb_loc, block, block), masked below
            Lik = jnp.where(below, Lik, 0.0)
            # build (n,) column mask for cols > k (applied via panel zeroing)
            panel_flat = panel.reshape(nb * block, block)
            col_ids = jnp.repeat(jnp.arange(nb), block)
            panel_flat = jnp.where(
                (col_ids > k)[:, None], panel_flat, 0.0)
            update = jnp.einsum("lbc,nc->lbn", Lik, panel_flat)
            local = local - update
        return local[None]

    Lc = factorize(Kc)  # (D, nb_loc, block, n)

    def from_cyclic(Lc):
        return (
            Lc.transpose(1, 0, 2, 3).reshape(nb, block, n).reshape(n, n)
        )

    return jnp.tril(from_cyclic(Lc))
