"""Pallas TPU kernel: tiled derivative-observation covariance build.

The innermost unit of the reference is the generated scalar kernel module
(``python/05_tokamak/SympGPR/kernels.f90:58-120``) called once per matrix
entry by the Fortran builder (``sympgpr.f90:12-38``).  The XLA replacement
(``gp/covariance.py:build_K_fast``) is already vectorized but evaluates the
q-factor ``A = exp(-s)`` and P-factor ``B = exp(-dP^2/2ly^2)`` as *separate*
exponentials and materializes several (N, N0) temporaries between fused
loops; measured on v5e it is transcendental-bound at ~1.9 G entries/s
(docs/DESIGN.md section 3).

This kernel builds the full (2N, 2N0) block matrix tile-by-tile in VMEM:

* one program computes a (TILE, TILE) tile of the pair grid and emits ALL
  derivative blocks from shared factors — one ``sin``/``cos`` pair and ONE
  fused ``exp`` of the log-space sum ``-(s(dq) + dP^2/2ly^2)`` per pair
  (3 transcendentals/entry instead of 4+), exactly the factor sharing the
  map-step kernel already exploits per orbit (``ops/pallas_step.py``);
* the three distinct blocks (the two mixed blocks d2k/dq dP' and
  d2k/dP dq' are elementwise equal for these stationary product kernels)
  are written once each, straight from VMEM — no HBM-level temporaries;
* the 2x2 block layout is assembled by a single bandwidth-bound
  ``jnp.block`` pass (~0.5 ms at 2N = 8192 on v5e, negligible next to the
  transcendental-bound build).

Differentiation: hyperparameter gradients flow through a ``custom_vjp``
whose backward pass is the autodiff VJP of the closed-form XLA build —
exact (it is the same math), O(N^2) like the forward, and it keeps the
Pallas kernel itself gradient-free.  ``X``/``X0`` are data, not trainable;
their cotangents are returned as zeros.

Supported kernels: ``per_se`` (periodic x SE; the periodic factor is
``per_se_freq`` with frequency fixed at 1/2), ``per_se_freq``, ``se_se``,
and the separable ``sum_per_se`` (mixed block identically zero).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# kernel-name -> static kind id compiled into the tile program
KINDS = {"per_se": 0, "se_se": 1, "per_se_freq": 2, "sum_per_se": 3}
PRODUCT_KINDS = ("per_se", "se_se", "per_se_freq")

TILE = 256  # (TILE, TILE) f32 tile = 256 KB/block output, 3 blocks in VMEM


def _tile_blocks(kind: int, dq, dP, lx, ly, sig, f):
    """(kxx, kxy, kyy) derivative blocks from shared factors.

    Shared by the forward tile and — through ``jax.grad`` at kernel trace
    time — the backward contraction tile, so the two can never drift.
    """
    i2 = 0.5 / (lx * lx)
    if kind == 1:  # squared exponential: s = dq^2/(2lx^2)
        s = dq * dq * i2
        sp = 2.0 * dq * i2
        spp = jnp.full_like(dq, 1.0) * (2.0 * i2)
    else:  # periodic: s = sin^2(f dq)/(2lx^2); per_se is f = 1/2
        sh = jnp.sin(f * dq)
        ch = jnp.cos(f * dq)
        sh2 = sh * sh
        s = sh2 * i2
        sp = (2.0 * f) * sh * ch * i2
        spp = (2.0 * f * f) * (1.0 - 2.0 * sh2) * i2

    ily2 = 1.0 / (ly * ly)
    t = (dP * dP) * (0.5 * ily2)
    if kind == 3:  # separable sum: no cross factor, mixed block vanishes
        A = sig * jnp.exp(-s)
        B = sig * jnp.exp(-t)
        return ((spp - sp * sp) * A, jnp.zeros_like(dq),
                (ily2 - dP * dP * ily2 * ily2) * B)
    AB = sig * jnp.exp(-(s + t))  # ONE exp for both factors
    return ((spp - sp * sp) * AB, -sp * dP * ily2 * AB,
            (ily2 - dP * dP * ily2 * ily2) * AB)


def _cov_tile(scal_ref, qr_ref, Pr_ref, qc_ref, Pc_ref,
              kxx_ref, kxy_ref, kyy_ref, *, kind: int):
    """One (TILE, TILE) tile of all derivative blocks, shared factors."""
    dq = qr_ref[:] - qc_ref[:]  # (TILE, 1) - (1, TILE) -> (TILE, TILE)
    dP = Pr_ref[:] - Pc_ref[:]
    kxx, kxy, kyy = _tile_blocks(
        kind, dq, dP, scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    kxx_ref[:] = kxx
    kxy_ref[:] = kxy
    kyy_ref[:] = kyy


@functools.partial(jax.jit, static_argnames=("kind", "tile", "interpret"))
def _blocks_call(scal, qr, Pr, qc, Pc, kind, tile, interpret):
    """Pallas launch over the (rows/tile, cols/tile) grid.

    qr/Pr: (N_pad, 1) row coordinates; qc/Pc: (1, N0_pad) column
    coordinates; returns three (N_pad, N0_pad) blocks.
    """
    n_pad, n0_pad = qr.shape[0], qc.shape[1]
    kernel = functools.partial(_cov_tile, kind=kind)
    row = pl.BlockSpec((tile, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, tile), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n_pad, n0_pad), qr.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // tile, n0_pad // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  row, row, col, col],
        out_specs=(out, out, out),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(scal, qr, Pr, qc, Pc)


def _pad_to(x: Array, n: int, axis: int) -> Array:
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _build_impl(kernel_name, X, X0, params, sig, tile, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kind = KINDS[kernel_name]
    N, N0 = X.shape[0], X0.shape[0]
    n_pad = -(-N // tile) * tile
    n0_pad = -(-N0 // tile) * tile
    dt = X.dtype
    freq = params[2] if kernel_name == "per_se_freq" else jnp.asarray(0.5, dt)
    scal = jnp.stack([
        jnp.asarray(params[0], dt), jnp.asarray(params[1], dt),
        jnp.asarray(sig, dt), jnp.asarray(freq, dt),
    ])
    qr = _pad_to(X[:, 0:1], n_pad, 0)
    Pr = _pad_to(X[:, 1:2], n_pad, 0)
    qc = _pad_to(X0[:, 0:1].T, n0_pad, 1)
    Pc = _pad_to(X0[:, 1:2].T, n0_pad, 1)
    kxx, kxy, kyy = _blocks_call(scal, qr, Pr, qc, Pc, kind, tile, interpret)
    kxx, kxy, kyy = (b[:N, :N0] for b in (kxx, kxy, kyy))
    # both mixed blocks equal elementwise for these stationary kernels
    # (d2k/dq dP' = d2k/dP dq' = -A' B'); layout per gp/covariance.py
    return jnp.block([[kxx, kxy], [kxy, kyy]])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def build_K_pallas(kernel, X: Array, X0: Array, params: Array,
                   sig: Array) -> Array:
    """Derivative-observation covariance (2N, 2N0), Pallas tiled build.

    Drop-in equal to ``gp.covariance.build_K`` (f32 tolerance; validated in
    ``tests/test_pallas_cov.py``).  ``kernel`` is a
    ``kernels.variants.Kernel`` (static under jit).
    """
    return _build_impl(kernel.name, X, X0, params, sig, TILE, None)


def _build_fwd(kernel, X, X0, params, sig):
    return build_K_pallas(kernel, X, X0, params, sig), (X, X0, params, sig)


# --- closed-form hyperparameter-gradient contraction -----------------------
#
# The backward of the builder is the contraction <Kbar, dK/dtheta> for the
# O(1) scalars theta = (lx, ly, sig[, freq]).  The reference assembles three
# full dK matrices and traces them (``python/functions/func.py:148-162``);
# here ONE tile pass re-derives the blocks via jax.grad *of the same
# _tile_blocks closure the forward uses* and reduces the contraction
# in-register — no dK matrices ever touch HBM, and the derivative algebra
# cannot drift from the forward.


def _cov_bwd_tile(scal_ref, qr_ref, Pr_ref, qc_ref, Pc_ref,
                  gxx_ref, gxy_ref, gyy_ref, acc_ref, *, kind: int):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    dq = qr_ref[:] - qc_ref[:]
    dP = Pr_ref[:] - Pc_ref[:]
    gxx = gxx_ref[:]
    gxy = gxy_ref[:]
    gyy = gyy_ref[:]

    def contract(lx, ly, sig, f):
        kxx, kxy, kyy = _tile_blocks(kind, dq, dP, lx, ly, sig, f)
        return jnp.sum(gxx * kxx + gxy * kxy + gyy * kyy)

    g = jax.grad(contract, argnums=(0, 1, 2, 3))(
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    r = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)
    part = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    for i, gi in enumerate(g):
        part = part + jnp.where((r == 0) & (c == i), gi, 0.0)

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + part


@functools.partial(jax.jit, static_argnames=("kind", "tile", "interpret"))
def _bwd_call(scal, qr, Pr, qc, Pc, gxx, gxy, gyy, kind, tile, interpret):
    n_pad, n0_pad = qr.shape[0], qc.shape[1]
    kernel = functools.partial(_cov_bwd_tile, kind=kind)
    row = pl.BlockSpec((tile, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, tile), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM)
    g = pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // tile, n0_pad // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  row, row, col, col, g, g, g],
        out_specs=acc,
        out_shape=jax.ShapeDtypeStruct((8, 128), qr.dtype),
        interpret=interpret,
    )(scal, qr, Pr, qc, Pc, gxx, gxy, gyy)


def cov_param_grads(kernel_name: str, X: Array, X0: Array, params: Array,
                    sig: Array, Kbar: Array, *, tile: int = TILE,
                    interpret: bool | None = None):
    """(dparams, dsig) = <Kbar, dK/dtheta> for the (2N, 2N0) build.

    Kbar is the cotangent of ``build_K_pallas``'s output (any symmetric or
    asymmetric (2N, 2N0) array).  The two mixed blocks multiply the same
    kernel value, so their cotangents are summed before the tile pass.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kind = KINDS[kernel_name]
    N, N0 = X.shape[0], X0.shape[0]
    n_pad = -(-N // tile) * tile
    n0_pad = -(-N0 // tile) * tile
    dt = X.dtype
    freq = params[2] if kernel_name == "per_se_freq" else jnp.asarray(0.5, dt)
    scal = jnp.stack([
        jnp.asarray(params[0], dt), jnp.asarray(params[1], dt),
        jnp.asarray(sig, dt), jnp.asarray(freq, dt),
    ])
    qr = _pad_to(X[:, 0:1], n_pad, 0)
    Pr = _pad_to(X[:, 1:2], n_pad, 0)
    qc = _pad_to(X0[:, 0:1].T, n0_pad, 1)
    Pc = _pad_to(X0[:, 1:2].T, n0_pad, 1)

    def padg(b):  # zero-padded cotangents kill the padded-pair garbage
        return _pad_to(_pad_to(b, n_pad, 0), n0_pad, 1)

    gxx = padg(Kbar[:N, :N0])
    gxy = padg(Kbar[:N, N0:] + Kbar[N:, :N0])
    gyy = padg(Kbar[N:, N0:])
    acc = _bwd_call(scal, qr, Pr, qc, Pc, gxx, gxy, gyy, kind, tile,
                    interpret)
    dlx, dly, dsig, dfreq = acc[0, 0], acc[0, 1], acc[0, 2], acc[0, 3]
    if kernel_name == "per_se_freq":
        dparams = jnp.stack([dlx, dly, dfreq])
    else:
        dparams = jnp.stack([dlx, dly])
    if params.shape[0] > dparams.shape[0]:  # unused trailing params
        dparams = jnp.concatenate(
            [dparams, jnp.zeros(params.shape[0] - dparams.shape[0], dt)])
    return dparams.astype(params.dtype), dsig.astype(dt)


def _build_bwd(kernel, res, Kbar):
    X, X0, params, sig = res
    dparams, dsig = cov_param_grads(kernel.name, X, X0, params, sig, Kbar)
    return (jnp.zeros_like(X), jnp.zeros_like(X0), dparams,
            jnp.asarray(dsig, jnp.asarray(sig).dtype))


build_K_pallas.defvjp(_build_fwd, _build_bwd)


# --- NLL wiring -----------------------------------------------------------

_THRESHOLD_ENV = "SYMPGPR_PALLAS_COV_THRESHOLD"


def nll_threshold() -> int:
    """Minimum N (training points) for the Pallas covariance build in
    ``gp.likelihood.nll``.  Default 512 on an accelerator backend; the CPU
    backend would only run the kernel interpreted (orders of magnitude
    slower than XLA), so it is effectively disabled there unless the env
    var overrides it (as the interpret-mode tests do)."""
    env = os.environ.get(_THRESHOLD_ENV)
    if env is not None:
        return int(env)
    if jax.default_backend() == "cpu":
        return np.iinfo(np.int64).max
    return 512


def want_pallas_build(kernel, X: Array) -> bool:
    """Static (trace-time) dispatch decision for the NLL covariance build."""
    return (
        kernel.name in KINDS
        and X.dtype == jnp.float32
        and X.shape[0] >= nll_threshold()
    )
