"""Pallas TPU kernel: one fully-fused symplectic map step.

The XLA path for a map step (``maps/fast_apply.py``) lowers to ~30 separate
fused elementwise ops per scan iteration (aux guess, coefficient build, 6-8
Newton iterations, q update).  This kernel performs the *entire* step in one
``pallas_call``: all (train x orbit-lane) intermediates live in VMEM, the
Newton loop runs in registers/VMEM with zero HBM round trips, and the only
HBM traffic per step is reading the (padded) training set and writing the
(1, 128)-per-tile outputs.

Two kernels are provided:

* ``fused_map_step`` — one map step per call; orbits on sublanes (tiles of
  TILE_B=256 rows), training points padded onto the 128-lane axis.
* ``rollout_in_kernel`` — the ENTIRE nm-step rollout in one ``pallas_call``
  (orbits on lanes, tiles of 128): removes the per-step scan dispatch floor
  (~30 us/step measured on v5e through the tunnel), which dominates at
  small/medium batch; trajectory rows are written directly into the VMEM
  output block, and the tokamak loss-boundary check (20-iteration
  ``compute_r`` Newton) can be fused in.

Math contract is identical to ``maps/fast_apply.py`` (factorized product
kernel A(dq) * B(dP)); validated against it in ``tests/test_pallas_step.py``
(interpret mode on CPU, compiled on TPU).  Note on float32: |alpha| of a
smooth-kernel GP with tiny jitter is large (1e3+), so per-step posterior
sums carry ~1e-4..1e-3 summation-order noise; chaotic orbits diverge between
any two f32 evaluation orders while the Poincare structure and energy
statistics are preserved.  Bitwise-critical runs should use the float64
generic path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sympgpr_tpu.gp.model import AuxGP, SympGP

Array = jax.Array

LANES = 128
_KIND = {"per_se": 0, "se_se": 1}


class PackedModels(struct.PyTreeNode):
    """Model arrays padded to sublane multiples, orbit-lane broadcastable.

    a0/a1 carry the sig factor; padding rows have zero alpha (their
    contributions vanish identically).  kind ids are static (not traced).
    """

    uq: Array      # (1, N_pad) train q
    uP: Array      # (1, N_pad) train P
    a0: Array      # (1, N_pad) sig * alpha_dq
    a1: Array      # (1, N_pad) sig * alpha_dP
    auxq: Array    # (1, Na_pad)
    auxp: Array    # (1, Na_pad)
    auxa: Array    # (1, Na_pad) sig_aux * alpha_aux
    scal: Array    # (8,) lx, ly, aux_lx, aux_ly, aux_delta, mod_q, pad, pad
    kind: int = struct.field(pytree_node=False, default=0)
    aux_kind: int = struct.field(pytree_node=False, default=0)
    # true (unpadded) training-set sizes; the sublane-major rollout path
    # re-pads to a multiple of 8 sublanes instead of 128 lanes (at N=80
    # that's 88 rows instead of 128 — 1.45x less VPU work per step)
    n: int = struct.field(pytree_node=False, default=0)
    na: int = struct.field(pytree_node=False, default=0)


def _pad_row(x: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((1, n), dtype=np.float32)
    out[0, : len(x)] = x
    return out


def pack_models(sgp: SympGP, aux: AuxGP, mod_q: float | None) -> PackedModels:
    """Preprocess fitted models once for the fused kernel.

    Training points ride the 128-lane axis (padded to a lane multiple);
    orbits ride sublanes in tiles of TILE_B rows.
    """
    n = sgp.n_train
    n_pad = max(LANES, -(-n // LANES) * LANES)
    a = np.asarray(sgp.alpha, np.float64).reshape(2, n)
    sig = float(sgp.sig)
    na = aux.X.shape[0]
    na_pad = max(LANES, -(-na // LANES) * LANES)
    scal = np.zeros(8, np.float32)
    scal[0] = float(sgp.params[0])
    scal[1] = float(sgp.params[1])
    scal[2] = float(aux.params[0])
    scal[3] = float(aux.params[1])
    scal[4] = 1.0 if aux.delta else 0.0
    scal[5] = mod_q if mod_q is not None else 0.0
    return PackedModels(
        uq=jnp.asarray(_pad_row(np.asarray(sgp.X[:, 0]), n_pad)),
        uP=jnp.asarray(_pad_row(np.asarray(sgp.X[:, 1]), n_pad)),
        a0=jnp.asarray(_pad_row(sig * a[0], n_pad)),
        a1=jnp.asarray(_pad_row(sig * a[1], n_pad)),
        auxq=jnp.asarray(_pad_row(np.asarray(aux.X[:, 0]), na_pad)),
        auxp=jnp.asarray(_pad_row(np.asarray(aux.X[:, 1]), na_pad)),
        auxa=jnp.asarray(
            _pad_row(float(aux.sig) * np.asarray(aux.alpha), na_pad)
        ),
        scal=jnp.asarray(scal),
        kind=_KIND[sgp.kernel.name],
        aux_kind=_KIND[aux.kernel.name],
        n=n,
        na=na,
    )


def _afactors(kind: int, d, lx):
    """A(d) = exp(-s), s'(d), s''(d); kind is a *static* python int."""
    s, sp, spp = _sfactors(kind, d, lx)
    return jnp.exp(-s), sp, spp


def _sfactors(kind: int, d, lx):
    """Log-space kernel factor: s(d) with A = exp(-s), plus s', s''.

    One sin/cos pair at half angle covers all three periodic factors via
    double-angle identities (sin d = 2 sh ch, cos d = 1 - 2 sh^2) — one
    transcendental fewer per (N, B) block than evaluating sin d and cos d
    directly, and returning s (not exp(-s)) lets callers fuse several
    kernel factors into a single exp.
    """
    i2 = 0.5 / (lx * lx)
    if kind == 0:  # periodic: s = sin^2(d/2)/(2lx^2)
        sh = jnp.sin(0.5 * d)
        ch = jnp.cos(0.5 * d)
        s2 = sh * sh
        return s2 * i2, (sh * ch) * i2, (0.5 - s2) * i2
    # squared exponential: s = d^2/(2lx^2)
    return d * d * i2, d * (2.0 * i2), jnp.full_like(d, 2.0 * i2)


def _step_kernel(
    scal_ref, uq_ref, uP_ref, a0_ref, a1_ref, auxq_ref, auxp_ref, auxa_ref,
    q_ref, p_ref, Q_out, P_out, *, kind: int, aux_kind: int, iters: int,
):
    q = q_ref[:]  # (TILE_B, 1)
    p = p_ref[:]
    lx = scal_ref[0]
    ly = scal_ref[1]
    alx = scal_ref[2]
    aly = scal_ref[3]
    delta = scal_ref[4]
    mod_q = scal_ref[5]
    ily2 = 1.0 / (ly * ly)

    # ---- aux guess (one pass over aux train lanes) ----
    dqa = auxq_ref[:] - q  # (TILE_B, Na) via broadcast
    sa, _, _ = _sfactors(aux_kind, dqa, alx)
    dpa = auxp_ref[:] - p
    st = sa + (dpa * dpa) * (0.5 / (aly * aly))
    mean = jnp.sum(auxa_ref[:] * jnp.exp(-st), axis=1, keepdims=True)
    P = mean + delta * p

    # ---- Newton-invariant coefficients ----
    d = uq_ref[:] - q  # (TILE_B, N)
    A, sp, spp = _afactors(kind, d, lx)
    a0 = a0_ref[:]
    a1 = a1_ref[:]
    c0 = a0 * (spp - sp * sp) * A
    c1 = -a1 * sp * A * ily2
    c2 = -a0 * sp * A * ily2
    c3 = a1 * A
    uP = uP_ref[:]

    # ---- Newton iterations, all in VMEM ----
    def body(_, P):
        dP = uP - P
        B = jnp.exp(-(dP * dP) * (0.5 * ily2))
        f = jnp.sum((c0 + c1 * dP) * B, axis=1, keepdims=True) - p + P
        fp = jnp.sum(
            (c0 * dP * ily2 + c1 * (dP * dP * ily2 - 1.0)) * B,
            axis=1, keepdims=True,
        ) + 1.0
        Pn = P - f / fp
        return jnp.where(jnp.isfinite(Pn), Pn, P)

    P = jax.lax.fori_loop(0, iters, body, P)

    # ---- q update ----
    dP = uP - P
    B = jnp.exp(-(dP * dP) * (0.5 * ily2))
    dq = jnp.sum((c2 * dP + c3 * (ily2 - dP * dP * ily2 * ily2)) * B,
                 axis=1, keepdims=True)
    Q = q + dq
    Q = jnp.where(mod_q > 0.0, Q - jnp.floor(Q / mod_q) * mod_q, Q)
    Q = jnp.where(jnp.isfinite(P), Q, jnp.nan)
    Q_out[:] = Q
    P_out[:] = P


TILE_B = 256


@functools.partial(
    jax.jit, static_argnames=("kind", "aux_kind", "iters", "interpret")
)
def _fused_step_call(
    packed_arrays, qcol, pcol, kind, aux_kind, iters, interpret
):
    uq, uP, a0, a1, auxq, auxp, auxa, scal = packed_arrays
    B = qcol.shape[0]
    kernel = functools.partial(
        _step_kernel, kind=kind, aux_kind=aux_kind, iters=iters
    )

    def full(a):
        return pl.BlockSpec(a.shape, lambda g: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    batch = pl.BlockSpec((TILE_B, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
    Q, P = pl.pallas_call(
        kernel,
        grid=(B // TILE_B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            full(uq), full(uP), full(a0), full(a1),
            full(auxq), full(auxp), full(auxa),
            batch, batch,
        ],
        out_specs=(batch, batch),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), qcol.dtype),
            jax.ShapeDtypeStruct((B, 1), qcol.dtype),
        ),
        interpret=interpret,
    )(scal, uq, uP, a0, a1, auxq, auxp, auxa, qcol, pcol)
    return Q, P


def fused_map_step(
    pm: PackedModels, q: Array, p: Array, iters: int = 8,
    interpret: bool = False,
):
    """One implicit symplectic map step for a batch (B,) of orbits.

    B must be a multiple of TILE_B=256 (pad with NaN orbits upstream).
    """
    B = q.shape[0]
    assert B % TILE_B == 0, f"batch {B} must be a multiple of {TILE_B}"
    arrays = (pm.uq, pm.uP, pm.a0, pm.a1, pm.auxq, pm.auxp, pm.auxa, pm.scal)
    Q, P = _fused_step_call(
        arrays, q.reshape(B, 1), p.reshape(B, 1),
        pm.kind, pm.aux_kind, iters, interpret,
    )
    return Q.reshape(B), P.reshape(B)


@functools.partial(
    jax.jit, static_argnames=("nm", "iters", "interpret", "save_traj")
)
def rollout_fused(
    pm: PackedModels, q0: Array, p0: Array, nm: int, iters: int = 8,
    interpret: bool = False, save_traj: bool = True,
):
    """nm-step rollout using the fused kernel inside one lax.scan."""

    def step(carry, _):
        q, p = carry
        Q, P = fused_map_step(pm, q, p, iters=iters, interpret=interpret)
        return (Q, P), ((Q, P) if save_traj else None)

    (q, p), traj = jax.lax.scan(step, (q0, p0), None, length=nm - 1)
    if not save_traj:
        return q, p
    qs = jnp.concatenate([q0[None], traj[0]], axis=0)
    ps = jnp.concatenate([p0[None], traj[1]], axis=0)
    return qs, ps


# ---------------------------------------------------------------------------
# Whole-rollout kernel: the time loop lives INSIDE the pallas program.
#
# One pallas_call per rollout: grid over orbit tiles; each program iterates
# all nm-1 map steps for its 128-lane orbit tile, writing trajectory rows
# straight into its VMEM-resident output block.  This removes the per-step
# lax.scan dispatch floor (~30 us/step measured on v5e via the tunnel), which
# dominates at small/medium batch sizes.  Orbits ride lanes here; training
# points ride sublanes.


def _rollout_kernel(
    scal_ref, uq_ref, uP_ref, a0_ref, a1_ref, auxq_ref, auxp_ref, auxa_ref,
    q0_ref, p0_ref, Q_out, P_out, *, kind: int, aux_kind: int, iters: int,
    nm: int, loss_check: bool,
):
    g = pl.program_id(0)
    lx = scal_ref[0]
    ly = scal_ref[1]
    alx = scal_ref[2]
    aly = scal_ref[3]
    delta = scal_ref[4]
    mod_q = scal_ref[5]
    ily2 = 1.0 / (ly * ly)

    uq = uq_ref[:]      # (N, 1) sublane-major train coords
    uP = uP_ref[:]
    a0 = a0_ref[:]
    a1 = a1_ref[:]
    auxq = auxq_ref[:]
    auxp = auxp_ref[:]
    auxa = auxa_ref[:]

    q = q0_ref[pl.ds(g, 1), :]  # (1, LANE_TILE)
    p = p0_ref[pl.ds(g, 1), :]
    Q_out[pl.ds(0, 1), :] = q
    P_out[pl.ds(0, 1), :] = p

    def map_step(i, carry):
        q, p = carry
        # aux guess — q- and p-factors fused into ONE exp (log-space sum)
        dqa = auxq - q
        sa, _, _ = _sfactors(aux_kind, dqa, alx)
        dpa = auxp - p
        st = sa + (dpa * dpa) * (0.5 / (aly * aly))
        mean = jnp.sum(auxa * jnp.exp(-st), axis=0, keepdims=True)
        P = mean + delta * p
        # Newton-invariant coefficients
        d = uq - q
        s, sp, spp = _sfactors(kind, d, lx)
        A = jnp.exp(-s)
        c0 = a0 * (spp - sp * sp) * A
        c1 = -a1 * sp * A * ily2
        c2 = -a0 * sp * A * ily2
        c3 = a1 * A
        c0i = c0 * ily2
        c1i = c1 * ily2

        def newton(_, P):
            dP = uP - P
            dP2 = dP * dP
            B = jnp.exp(-dP2 * (0.5 * ily2))
            f = jnp.sum((c0 + c1 * dP) * B, axis=0, keepdims=True) - p + P
            fp = jnp.sum(
                (c0i * dP + c1i * dP2 - c1) * B, axis=0, keepdims=True,
            ) + 1.0
            Pn = P - f / fp
            return jnp.where(jnp.isfinite(Pn), Pn, P)

        P = jax.lax.fori_loop(0, iters, newton, P)

        if loss_check:
            # tokamak loss boundary: r from pth = Ath(r, th) (20-iter
            # Newton, fieldlines.f90:94-107), poison r > 0.5 or P < 0.
            # cos(q) is loop-invariant — hoisted (it was 36% of the whole
            # rollout when evaluated inside the iteration).
            pth = P * 1e-2
            cq = jnp.cos(q)

            def rit(_, r):
                y = pth - (r * r / 2.0 - r * r * r / 3.0 * cq)
                dy = -(r - r * r * cq)
                return r - y / dy

            r = jax.lax.fori_loop(0, 20, rit, jnp.full_like(P, 0.3))
            P = jnp.where((r > 0.5) | (P < 0.0), jnp.nan, P)

        dP = uP - P
        dP2 = dP * dP
        B = jnp.exp(-dP2 * (0.5 * ily2))
        dq = jnp.sum((c2 * dP + c3 * (ily2 - dP2 * ily2 * ily2)) * B,
                     axis=0, keepdims=True)
        Q = q + dq
        Q = jnp.where(mod_q > 0.0, Q - jnp.floor(Q / mod_q) * mod_q, Q)
        Q = jnp.where(jnp.isfinite(P), Q, jnp.nan)
        Q_out[pl.ds(i, 1), :] = Q
        P_out[pl.ds(i, 1), :] = P
        return (Q, P)

    jax.lax.fori_loop(1, nm, map_step, (q, p))


def _pack_cols(pm: PackedModels):
    """Transpose packed rows (1, N_pad) -> sublane-major columns.

    The sublane axis only needs a multiple of 8, so slice the 128-lane
    padding back down (zero-alpha pad rows contribute nothing either way;
    keeping 88 instead of 128 rows at N=80 cuts the dominant (N, B)
    elementwise work by 1.45x).
    """

    def cut(a, k):
        if k <= 0:  # legacy packs without sizes
            return a.reshape(-1, 1)
        k8 = max(8, -(-k // 8) * 8)
        return a[:, :k8].reshape(-1, 1)

    return (cut(pm.uq, pm.n), cut(pm.uP, pm.n), cut(pm.a0, pm.n),
            cut(pm.a1, pm.n), cut(pm.auxq, pm.na), cut(pm.auxp, pm.na),
            cut(pm.auxa, pm.na))


LANE_TILE = 128


@functools.partial(
    jax.jit,
    static_argnames=("kind", "aux_kind", "iters", "nm", "loss_check",
                     "interpret"),
)
def _rollout_call(cols, scal, q0g, p0g, kind, aux_kind, iters, nm,
                  loss_check, interpret):
    uq, uP, a0, a1, auxq, auxp, auxa = cols
    G = q0g.shape[0]
    nm_pad = -(-nm // 8) * 8

    kernel = functools.partial(
        _rollout_kernel, kind=kind, aux_kind=aux_kind, iters=iters, nm=nm,
        loss_check=loss_check,
    )

    def full(a):
        return pl.BlockSpec(a.shape, lambda g: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    traj = pl.BlockSpec((nm_pad, LANE_TILE), lambda g: (0, g),
                        memory_space=pltpu.VMEM)
    Q, P = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full(uq), full(uP), full(a0), full(a1),
            full(auxq), full(auxp), full(auxa),
            full(q0g), full(p0g),
        ],
        out_specs=(traj, traj),
        out_shape=(
            jax.ShapeDtypeStruct((nm_pad, G * LANE_TILE), q0g.dtype),
            jax.ShapeDtypeStruct((nm_pad, G * LANE_TILE), q0g.dtype),
        ),
        interpret=interpret,
    )(scal, uq, uP, a0, a1, auxq, auxp, auxa, q0g, p0g)
    return Q[:nm], P[:nm]


def rollout_in_kernel(
    pm: PackedModels, q0: Array, p0: Array, nm: int, iters: int = 5,
    loss_check: bool = False, interpret: bool = False,
):
    """Full nm-step rollout in ONE pallas_call (trajectory included).

    iters=5 default: from the aux-GP warm start the Newton update is
    quadratically convergent and hits f32 roundoff in <=4 iterations
    (measured one-step max|dP| vs a 16-iteration solve: 7.6e-6 at 4, the
    same magnitude as the 8-vs-16 summation noise); 5 keeps one iteration
    of margin and is ~17% faster end-to-end than 8.

    B must be a multiple of 128.  VMEM per tile is ~2 * nm * 128 * 4 bytes;
    keep nm <= ~8000 per call (chunk longer rollouts with the final carry).
    Returns (nm, B) trajectories.
    """
    B = q0.shape[0]
    assert B % LANE_TILE == 0, f"batch {B} must be a multiple of {LANE_TILE}"
    G = B // LANE_TILE
    cols = _pack_cols(pm)
    q0g = q0.reshape(G, LANE_TILE)
    p0g = p0.reshape(G, LANE_TILE)
    Q, P = _rollout_call(cols, pm.scal, q0g, p0g, pm.kind, pm.aux_kind,
                         iters, nm, loss_check, interpret)
    return Q, P


def rollout_pallas(
    sgp: SympGP, aux: AuxGP, q0: Array, p0: Array, nm: int, *,
    mod_q: float | None = 2.0 * np.pi, iters: int = 5,
    loss_check: bool = False, deployment_jitter: float | None = 1e-3,
    interpret: bool | None = None, chunk: int = 4096,
):
    """Model-level fused rollout: any product-kernel (per_se / se_se)
    SympGP + AuxGP pair, arbitrary batch size and rollout length.

    Handles the full f32 deployment pipeline: host-side alpha
    re-conditioning (``SympGP.for_deployment``, an f64 Cholesky), f32
    cast, lane packing, NaN padding of the orbit batch to a multiple of
    128, the x64-off kernel trace, VMEM chunking of the time axis, and
    un-padding.  Returns (nm, B) trajectories (NaN rows for lost orbits).

    ``interpret`` defaults to True on the CPU backend (tests) and False on
    an accelerator.  ``deployment_jitter=None`` skips re-conditioning (use
    when the model was already solved at a deployment-scale jitter).
    """
    from sympgpr_tpu.devices import host_fit, to_default_device

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def cast32(t):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, t)

    with host_fit():
        if deployment_jitter is not None:
            sgp = sgp.for_deployment(deployment_jitter)
            aux = aux.for_deployment(deployment_jitter)
        pm = pack_models(cast32(sgp), cast32(aux), mod_q=mod_q)
    pm = to_default_device(pm)

    q0 = np.asarray(q0, np.float32)
    p0 = np.asarray(p0, np.float32)
    B = q0.shape[0]
    pad = (-B) % LANE_TILE
    q0p = to_default_device(jnp.asarray(
        np.concatenate([q0, np.full(pad, np.nan, np.float32)])))
    p0p = to_default_device(jnp.asarray(
        np.concatenate([p0, np.full(pad, np.nan, np.float32)])))
    with jax.enable_x64(False):
        Q, P = rollout_chunked(pm, q0p, p0p, nm, iters=iters,
                               loss_check=loss_check, interpret=interpret,
                               chunk=chunk)
    return Q[:, :B], P[:, :B]


def rollout_chunked(
    pm: PackedModels, q0: Array, p0: Array, nm: int, iters: int = 5,
    loss_check: bool = False, interpret: bool = False,
    chunk: int = 4096,
):
    """Arbitrary-length rollout via VMEM-sized ``rollout_in_kernel`` chunks.

    The whole-rollout kernel keeps its (nm, 128) trajectory block in VMEM,
    which caps nm per call; this splits the time axis into ``chunk``-step
    kernel launches carrying (q, p) across, so long reference rollouts
    (e.g. the 10k-step tokamak runs, calc_fieldlines.py:19) still pay the
    scan dispatch floor only once per chunk instead of once per step.
    Returns (nm, B) trajectories like ``rollout_in_kernel``.
    """
    if nm <= chunk:
        return rollout_in_kernel(pm, q0, p0, nm, iters=iters,
                                 loss_check=loss_check, interpret=interpret)
    # each n-row call emits the input state as row 0 and advances n-1 steps;
    # non-first chunks drop that duplicate row.  NaN-poisoned orbits carry
    # over naturally (NaN q/p stays NaN through the kernel).
    Qs, Ps = [], []
    q, p = q0, p0
    rows = 0
    while rows < nm:
        n = min(chunk, nm - rows + (1 if rows else 0))
        Q, P = rollout_in_kernel(pm, q, p, n, iters=iters,
                                 loss_check=loss_check, interpret=interpret)
        q, p = Q[-1], P[-1]
        Qs.append(Q if rows == 0 else Q[1:])
        Ps.append(P if rows == 0 else P[1:])
        rows += n if rows == 0 else n - 1
    return jnp.concatenate(Qs, axis=0), jnp.concatenate(Ps, axis=0)
