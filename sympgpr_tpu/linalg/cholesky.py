"""Distributed Cholesky factorization.

The reference factorizes on one CPU through scipy/LAPACK
(``python/01_pendulum/implicit/func.py:105``).  For covariance matrices
that outgrow one chip's HBM, ``distributed_cholesky`` runs a right-looking
blocked algorithm with block rows distributed cyclically over a mesh axis
via `shard_map`: the diagonal block is combined with a masked `psum`
(broadcast over ICI), every device factorizes the small diagonal block
redundantly, panels are solved locally, and the panel column is
`all_gather`-ed for the trailing update (the BASELINE.json "block
allreduce/broadcast collectives over ICI" north star).  Exact (no
iterative refinement) and validated against ``jnp.linalg.cholesky`` on
the 8-device CPU mesh in tests.

Single-device verdict (VERDICT round-3 item 6, measured v5e n=8192 f32 on
the N=4096 large_n GP covariance): a single-device right-looking blocked
Cholesky here ran at 21.8-22.4 ms (block 512-2048) with float32-pinned
trailing updates vs 19.8 ms for ``jnp.linalg.cholesky`` — XLA wins, so
the single-device variant was DELETED rather than adopted.  (An earlier
13.9 ms reading came from the trailing update silently running as one
bf16 MXU pass; that variant NaNs on ill-conditioned GP covariances and
is not a usable factorization.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Array = jax.Array


def pad_spd(K: Array, multiple: int) -> Array:
    """Pad an SPD matrix to the next multiple with an identity tail.

    ``chol(diag(K, I)) = diag(chol(K), I)``, so factoring the padded
    matrix and slicing back ``[:n, :n]`` is exact; padded solve inputs
    are zero-extended and padded logdet contributions vanish.
    """
    n = K.shape[0]
    n_pad = -(-n // multiple) * multiple
    if n_pad == n:
        return K
    Kp = jnp.pad(K, ((0, n_pad - n), (0, n_pad - n)))
    tail = jnp.arange(n, n_pad)
    return Kp.at[tail, tail].set(jnp.asarray(1.0, K.dtype))


@partial(jax.jit, static_argnames=("block", "precision"))
def left_cholesky(
    K: Array, block: int = 512, precision: str = "float32"
) -> Array:
    """Lower Cholesky factor via LEFT-looking blocked panels.

    The right-looking variant lost to XLA here because every step
    rewrote the whole trailing submatrix through dynamic_update_slice
    (~5 ms of copies at n=8192) and pushed its panel solve through the
    ~13 TF/s n-rhs triangular_solve.  Left-looking instead:

    * updates ONE column panel per step:
      ``col -= L[kb:, :kb] @ L[kb:(k+1)b, :kb]^T`` — a single MXU matmul
      at ``precision`` (f32 3-pass, ~26 TF/s measured);
    * factors the (block, block) diagonal with LAPACK-lowered
      ``jnp.linalg.cholesky``;
    * forms the below-diagonal panel as ``col @ Lkk^{-T}`` — a b x b
      triangular solve plus an MXU matmul instead of a big-rhs solve;
    * never touches the trailing submatrix, so data movement is the
      O(n^2) panel assembly instead of O(n^2 nb) trailing copies.

    Exact same factor as ``jnp.linalg.cholesky`` up to f32 round-off
    (CPU parity test); ``precision`` is pinned f32 by default — the bf16
    default would destroy positive definiteness on GP covariances (see
    module docstring).
    """
    n_in = K.shape[0]
    K = pad_spd(K, block)
    n = K.shape[0]
    nb = n // block
    b = block
    eye_b = jnp.eye(b, dtype=K.dtype)

    panels: list[Array] = []
    for k in range(nb):
        col = jax.lax.slice(K, (k * b, k * b), (n, (k + 1) * b))
        if k:
            Lprev = jnp.concatenate(panels, axis=1)  # (n, k*b)
            Lrows = jax.lax.slice(Lprev, (k * b, 0), (n, k * b))
            Lk = jax.lax.slice(Lprev, (k * b, 0), ((k + 1) * b, k * b))
            col = col - jax.lax.dot_general(
                Lrows, Lk, (((1,), (1,)), ((), ())), precision=precision)
        Lkk = jnp.linalg.cholesky(col[:b])
        if k + 1 < nb:
            # below = col_below @ Lkk^{-T}; Wkk = Lkk^{-1} is a small
            # b x b solve, the bulk rides the MXU
            Wkk = jax.scipy.linalg.solve_triangular(Lkk, eye_b,
                                                    lower=True)
            below = jax.lax.dot_general(
                col[b:], Wkk, (((1,), (1,)), ((), ())),
                precision=precision)
            panel = jnp.concatenate(
                [jnp.zeros((k * b, b), K.dtype), jnp.tril(Lkk), below])
        else:
            panel = jnp.concatenate(
                [jnp.zeros((k * b, b), K.dtype), jnp.tril(Lkk)])
        panels.append(panel)
    return jnp.concatenate(panels, axis=1)[:n_in, :n_in]


def distributed_cholesky(
    K: Array, mesh: Mesh, axis: str = "kp", block: int | None = None
) -> Array:
    """Lower Cholesky factor with block rows cyclic over ``axis``.

    K: (n, n) replicated input; returns the replicated factor L.  The
    factorization itself runs with each device owning n/(D*block) block
    rows; only O(nb) small collectives (psum of the diagonal block,
    all_gather of the panel column) cross the interconnect per step.
    The step loop is a ``lax.fori_loop`` (shared with
    ``distributed.large``), so compile time is O(1) in the block count;
    non-divisible sizes are identity-padded via ``pad_spd``.

    This is the replicated-input convenience wrapper — the training path
    that never materializes K at all is ``distributed.large``
    (``sharded_nll_large`` / ``sharded_alpha_large``).
    """
    from sympgpr_tpu.distributed.large import _factorize_cyclic

    n_in = K.shape[0]
    D = mesh.shape[axis]
    if block is None:
        block = max(8, n_in // (4 * D))
    K = pad_spd(K, block * D)
    n = K.shape[0]
    nb = n // block
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
        d = jax.lax.axis_index(axis)
        return _factorize_cyclic(local[0], d, axis, D, nb, nb_loc,
                                 block)[None]

    Lc = factorize(Kc)  # (D, nb_loc, block, n)

    def from_cyclic(Lc):
        return (
            Lc.transpose(1, 0, 2, 3).reshape(nb, block, n).reshape(n, n)
        )

    return jnp.tril(from_cyclic(Lc))[:n_in, :n_in]
