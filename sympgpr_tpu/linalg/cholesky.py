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


@partial(jax.jit, static_argnames=("block",))
def blocked_cholesky(K: Array, block: int = 256) -> Array:
    """Lower Cholesky factor of SPD K via right-looking blocked updates.

    Non-divisible sizes are identity-padded (``pad_spd``) and sliced back.
    """
    n_in = K.shape[0]
    K = pad_spd(K, block)
    n = K.shape[0]
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
    return jnp.tril(A)[:n_in, :n_in]


def best_cholesky(Ky: Array, block: int = 1024) -> Array:
    """Fastest measured lower-Cholesky for this backend/size.

    Measured on TPU v5e (n=8192 f32, tools/r4_probe.py blocked):
    ``jnp.linalg.cholesky`` 16.6-19.7 ms vs ``blocked_cholesky``
    block=1024 13.9 ms (block=512: 15.6 ms, block=2048: 16.8 ms) — the
    right-looking blocked algorithm keeps the trailing update on the MXU
    as one big matmul while XLA's internal blocking is finer.  Adopted
    per VERDICT round-3 item 6: the blocked path is used on accelerator
    backends at n >= 4096 (below that the launch overhead of its
    unrolled panel loop dominates); CPU and small sizes keep the LAPACK
    path.  Exact same factor up to f32 round-off (parity-tested in
    tests/test_linalg.py).
    """
    n = Ky.shape[0]
    if jax.default_backend() != "cpu" and n >= 4096:
        return blocked_cholesky(Ky, block=block)
    return jnp.linalg.cholesky(Ky)


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
