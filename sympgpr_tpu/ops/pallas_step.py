"""Pallas TPU kernel: entire symplectic-map rollouts fused in one call.

The XLA path for a map step (``maps/fast_apply.py``) lowers to ~30 separate
fused elementwise ops per scan iteration (aux guess, coefficient build, 6-8
Newton iterations, q update).  ``rollout_in_kernel`` performs the ENTIRE
nm-step rollout in one ``pallas_call``: all (train x orbit-lane)
intermediates live in VMEM, the Newton loop runs in registers/VMEM with zero
HBM round trips, trajectory rows are written straight into the VMEM-resident
output block, and the per-step ``lax.scan`` dispatch floor (~30 us/step
measured on v5e through the tunnel) is paid once per call instead of once
per step.  Orbits ride lanes (tiles of 128); training points ride sublanes.

Full coverage of the reference's map-application modes (the generic autodiff
path ``maps/symplectic.py`` remains the float64 fallback):

* implicit product kernels ``per_se`` / ``se_se`` / ``per_se_freq`` with the
  aux-GP warm start + fixed-iteration Newton ("Algorithm 1",
  ``python/05_tokamak/SympGPR/sympgpr.f90:88-125``);
* explicit product update (``calc_P_explicit`` on a product kernel,
  ``python/01_pendulum/explicit/func_expl.py:106-128``);
* separable sum kernel ``sum_per_se`` ("Algorithm 2"): the mixed block
  vanishes, P depends only on q and dq only on P
  (``python/04_standard_map/func.py:174-179``);
* momentum wrap ``mod_p`` + unwrapped-momentum ``pdiff`` tracking
  (standard-map portraits, ``python/04_standard_map/main.py:78-86``);
* the tokamak loss-boundary check fused in (20-iteration ``compute_r``
  Newton, ``python/05_tokamak/SympGPR/func.py:200-203``), at the old q
  (single-map driver) or the new q (Split driver);
* Split multi-map cycling: step i uses sub-map ``i % n_maps``
  (``python/05_tokamak/Split_SympGPR/func.py`` ``applymap_tok``), with the
  per-map training blocks stacked on sublanes and sliced per step.

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

LANE_TILE = 128
_KIND = {"per_se": 0, "se_se": 1, "per_se_freq": 2, "sum_per_se": 3}
# sum kernels use the factor set of their q-side addend
_SUM_QSIDE = {"sum_per_se": 0}
NSCAL = 12  # lx, ly, alx, aly, delta, mod_q, freq, afreq, mod_p, 3x pad


class PackedModels(struct.PyTreeNode):
    """Sublane-major model arrays for the rollout kernel, n_maps stacked.

    Column arrays are (n_maps * ns, 1) with per-model stride ``ns`` (a
    multiple of 8 sublanes); padding rows carry zero alpha so their
    contributions vanish identically.  a0/a1/auxa carry the sig factor.
    ``scal`` is (n_maps, NSCAL) and lives in SMEM.  kind ids / sizes are
    static (not traced).
    """

    uq: Array      # (M*ns, 1) train q
    uP: Array      # (M*ns, 1) train P
    a0: Array      # (M*ns, 1) sig * alpha_dq
    a1: Array      # (M*ns, 1) sig * alpha_dP
    auxq: Array    # (M*nas, 1)
    auxp: Array    # (M*nas, 1)
    auxa: Array    # (M*nas, 1) sig_aux * alpha_aux
    scal: Array    # (M, NSCAL)
    a0lo: Array | None = None  # f32 residual of f64 sig*alpha_dq (see
    a1lo: Array | None = None  # ``compensated`` in rollout_in_kernel)
    kind: int = struct.field(pytree_node=False, default=0)
    aux_kind: int = struct.field(pytree_node=False, default=0)
    n_maps: int = struct.field(pytree_node=False, default=1)
    ns: int = struct.field(pytree_node=False, default=0)
    nas: int = struct.field(pytree_node=False, default=0)


def _pad8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


def _col(vals: list[np.ndarray], stride: int) -> jnp.ndarray:
    """Stack per-model 1-D arrays into one (M*stride, 1) f32 column."""
    out = np.zeros((len(vals), stride), np.float32)
    for m, v in enumerate(vals):
        out[m, : len(v)] = v
    return jnp.asarray(out.reshape(-1, 1))


def _freq_of(model) -> float:
    if model is not None and model.kernel.name == "per_se_freq":
        return float(model.params[2])
    return 0.0


def pack_models(
    sgp: SympGP, aux: AuxGP | None, mod_q: float | None,
    mod_p: float | None = None,
) -> PackedModels:
    """Preprocess one fitted (sgp, aux) pair for the fused rollout kernel."""
    return pack_models_split([sgp], [aux], mod_q=mod_q, mod_p=mod_p)


def pack_models_split(
    sgps: list[SympGP], auxes: list[AuxGP | None],
    mod_q: float | None, mod_p: float | None = None,
) -> PackedModels:
    """Stack ``M`` fitted sub-maps (Split tokamak) for in-kernel cycling.

    Every sub-map gets the same sublane stride (the max padded size), so a
    traced ``i % M`` can slice its block with one aligned dynamic slice.
    """
    assert len(sgps) == len(auxes) and len(sgps) >= 1
    M = len(sgps)
    kind = _KIND[sgps[0].kernel.name]
    assert all(_KIND[s.kernel.name] == kind for s in sgps), \
        "all sub-maps must share a kernel variant"
    aux0 = next((a for a in auxes if a is not None), None)
    aux_kind = _KIND[aux0.kernel.name] if aux0 is not None else 0

    ns = max(_pad8(s.n_train) for s in sgps)
    nas = max(_pad8(a.X.shape[0]) if a is not None else 8 for a in auxes)

    uq, uP, a0, a1 = [], [], [], []
    a0lo, a1lo = [], []
    auxq, auxp, auxa = [], [], []
    scal = np.zeros((M, NSCAL), np.float32)
    for m, (s, a) in enumerate(zip(sgps, auxes)):
        n = s.n_train
        al = np.asarray(s.alpha, np.float64).reshape(2, n)
        sig = float(s.sig)
        uq.append(np.asarray(s.X[:, 0]))
        uP.append(np.asarray(s.X[:, 1]))
        a0.append(sig * al[0])
        a1.append(sig * al[1])
        # double-f32 split of the f64 coefficients: hi = f32 rounding,
        # lo = the representation residual (itself f32-representable)
        c0 = sig * al[0]
        c1 = sig * al[1]
        a0lo.append(c0 - c0.astype(np.float32).astype(np.float64))
        a1lo.append(c1 - c1.astype(np.float32).astype(np.float64))
        if a is not None:
            auxq.append(np.asarray(a.X[:, 0]))
            auxp.append(np.asarray(a.X[:, 1]))
            auxa.append(float(a.sig) * np.asarray(a.alpha, np.float64))
        else:
            auxq.append(np.zeros(0))
            auxp.append(np.zeros(0))
            auxa.append(np.zeros(0))
        scal[m, 0] = float(s.params[0])
        scal[m, 1] = float(s.params[1])
        scal[m, 2] = float(a.params[0]) if a is not None else 1.0
        scal[m, 3] = float(a.params[1]) if a is not None else 1.0
        scal[m, 4] = 1.0 if (a is not None and a.delta) else 0.0
        scal[m, 5] = mod_q if mod_q is not None else 0.0
        scal[m, 6] = _freq_of(s)
        scal[m, 7] = _freq_of(a)
        scal[m, 8] = mod_p if mod_p is not None else 0.0

    return PackedModels(
        uq=_col(uq, ns), uP=_col(uP, ns), a0=_col(a0, ns), a1=_col(a1, ns),
        auxq=_col(auxq, nas), auxp=_col(auxp, nas), auxa=_col(auxa, nas),
        scal=jnp.asarray(scal), a0lo=_col(a0lo, ns), a1lo=_col(a1lo, ns),
        kind=kind, aux_kind=aux_kind,
        n_maps=M, ns=ns, nas=nas,
    )


def _sfactors(kind: int, d, lx, f):
    """Log-space kernel q-factor: s(d) with A = exp(-s), plus s', s''.

    One sin/cos pair covers all three periodic factors via double-angle
    identities (sin d = 2 sh ch, cos d = 1 - 2 sh^2) — one transcendental
    fewer per (N, B) block than evaluating sin d and cos d directly, and
    returning s (not exp(-s)) lets callers fuse several kernel factors
    into a single exp.  ``f`` is the traced frequency (kind 2 only).
    """
    i2 = 0.5 / (lx * lx)
    if kind == 0:  # periodic: s = sin^2(d/2)/(2lx^2)
        sh = jnp.sin(0.5 * d)
        ch = jnp.cos(0.5 * d)
        s2 = sh * sh
        return s2 * i2, (sh * ch) * i2, (0.5 - s2) * i2
    if kind == 2:  # learned-frequency periodic: s = sin^2(f d)/(2lx^2)
        sh = jnp.sin(f * d)
        ch = jnp.cos(f * d)
        s2 = sh * sh
        return s2 * i2, (2.0 * f) * (sh * ch) * i2, \
            (2.0 * f * f) * (1.0 - 2.0 * s2) * i2
    # squared exponential: s = d^2/(2lx^2)
    return d * d * i2, d * (2.0 * i2), jnp.full_like(d, 2.0 * i2)


def _afactors(kind: int, d, lx, f=0.0):
    """A(d) = exp(-s), s'(d), s''(d); kind is a *static* python int."""
    s, sp, spp = _sfactors(kind, d, lx, f)
    return jnp.exp(-s), sp, spp


# ---------------------------------------------------------------------------
# Whole-rollout kernel: the time loop lives INSIDE the pallas program.
#
# One pallas_call per rollout: grid over orbit tiles; each program iterates
# all nm-1 map steps for its 128-lane orbit tile, writing trajectory rows
# straight into its VMEM-resident output block.


def _two_sum(a, b):
    """Knuth's error-free transform: a + b = s + e exactly (f32)."""
    s = a + b
    ap = s - b
    bp = s - ap
    return s, (a - ap) + (b - bp)


def _comp_rsum(M):
    """Compensated cross-sublane reduction: (n, L) -> (1, L).

    Pairwise fold carrying a (hi, lo) double-f32 accumulator with TwoSum
    at every combine — the summation-order error drops from
    O(eps * sum|terms|) (catastrophic here: posterior sums cancel
    |alpha| ~ 1e3 terms down to O(1e-2) increments) to O(eps * |result|)
    + O(eps^2 * sum|terms|).  Levels are statically unrolled; zero
    padding to a power of two is exact (TwoSum with 0 is exact).
    Exact under cancellation (unit-tested); the measured END-TO-END
    effect on rollouts is a negative result — per-term product rounding
    dominates — recorded in DESIGN.md section 4.
    """
    n = M.shape[0]
    npow = 1 << max(0, n - 1).bit_length()
    if npow != n:
        M = jnp.concatenate(
            [M, jnp.zeros((npow - n,) + M.shape[1:], M.dtype)], axis=0)
    hi = M
    lo = jnp.zeros_like(M)
    k = npow // 2
    while k >= 1:
        s, e = _two_sum(hi[:k], hi[k:2 * k])
        lo = lo[:k] + lo[k:2 * k] + e
        hi = s
        k //= 2
    return hi + lo


def _rollout_kernel(
    scal_ref, uq_ref, uP_ref, a0_ref, a1_ref, a0lo_ref, a1lo_ref,
    auxq_ref, auxp_ref, auxa_ref,
    q0_ref, p0_ref, *out_refs, kind: int, aux_kind: int, iters: int,
    nm: int, loss_check: bool, loss_at_new_q: bool, explicit: bool,
    track_pdiff: bool, n_maps: int, ns: int, nas: int, mxu_reduce: bool,
    compensated: bool = False,
):
    if mxu_reduce:
        # experimental: train-sublane reductions as (1, N)x(N, 128) dots on
        # the MXU instead of VPU cross-sublane adds.  Measured on v5e
        # (bench.py rollout_mxu detail): at the reference N<=80 the matmul
        # is ~1-row MXU utilization and does NOT beat the VPU reduction;
        # kept for re-measurement at larger N.
        ones_n = jnp.ones((1, n_maps * ns), jnp.float32)
        ones_na = jnp.ones((1, n_maps * nas), jnp.float32)

        def _rsum(M, ones):
            o = ones[:, : M.shape[0]] if M.shape[0] != ones.shape[1] else \
                ones
            return jax.lax.dot_general(
                o, M, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def rsum(M):
            return _rsum(M, ones_n)

        def rsum_aux(M):
            return _rsum(M, ones_na)
    else:
        def rsum(M):
            return jnp.sum(M, axis=0, keepdims=True)

        rsum_aux = rsum

    def csum(t, tl):
        """Accuracy-critical posterior reduction (``compensated`` mode
        only): compensated double-f32 TwoSum tree over the concatenated
        (hi-terms, lo-terms) stack."""
        return _comp_rsum(jnp.concatenate([t, tl], axis=0))
    g = pl.program_id(0)
    if track_pdiff:
        Q_out, P_out, D_out = out_refs
    else:
        Q_out, P_out = out_refs
        D_out = None

    q = q0_ref[pl.ds(g, 1), :]  # (1, LANE_TILE)
    p = p0_ref[pl.ds(g, 1), :]
    Q_out[pl.ds(0, 1), :] = q
    P_out[pl.ds(0, 1), :] = p
    if track_pdiff:
        D_out[pl.ds(0, 1), :] = p

    single = n_maps == 1
    if single:
        # hoist all model loads out of the time loop (the hot path)
        blocks0 = (uq_ref[:], uP_ref[:], a0_ref[:], a1_ref[:],
                   a0lo_ref[:], a1lo_ref[:],
                   auxq_ref[:], auxp_ref[:], auxa_ref[:])
        scal0 = tuple(scal_ref[0, j] for j in range(9))

    def map_step(i, carry):
        q, p, pd = carry
        if single:
            uq, uP, a0, a1, a0lo, a1lo, auxq, auxp, auxa = blocks0
            lx, ly, alx, aly, delta, mod_q, freq, afreq, mod_p = scal0
        else:
            m = jnp.mod(i - 1, n_maps)  # step index i-1 uses sub-map m
            o = m * ns
            uq = uq_ref[pl.ds(o, ns), :]
            uP = uP_ref[pl.ds(o, ns), :]
            a0 = a0_ref[pl.ds(o, ns), :]
            a1 = a1_ref[pl.ds(o, ns), :]
            a0lo = a0lo_ref[pl.ds(o, ns), :]
            a1lo = a1lo_ref[pl.ds(o, ns), :]
            oa = m * nas
            auxq = auxq_ref[pl.ds(oa, nas), :]
            auxp = auxp_ref[pl.ds(oa, nas), :]
            auxa = auxa_ref[pl.ds(oa, nas), :]
            (lx, ly, alx, aly, delta, mod_q, freq, afreq, mod_p) = (
                scal_ref[m, 0], scal_ref[m, 1], scal_ref[m, 2],
                scal_ref[m, 3], scal_ref[m, 4], scal_ref[m, 5],
                scal_ref[m, 6], scal_ref[m, 7], scal_ref[m, 8])
        ily2 = 1.0 / (ly * ly)

        # ---- q-side factors (Newton-invariant) ----
        d = uq - q
        if kind == 3:  # separable sum: q-side addend factors only
            s, sp, spp = _sfactors(_SUM_QSIDE["sum_per_se"], d, lx, freq)
            A = jnp.exp(-s)
            # Algorithm 2: pGP depends on q alone (the B addend's dq dq'
            # derivative vanishes); no Newton, no aux GP.
            g0 = (spp - sp * sp) * A
            if compensated:
                P = p - csum(a0 * g0, a0lo * g0)
            else:
                P = p - rsum(a0 * g0)
            c2 = c3 = None
        else:
            s, sp, spp = _sfactors(kind, d, lx, freq)
            A = jnp.exp(-s)
            g0 = (spp - sp * sp) * A
            g1 = -sp * A * ily2
            c0 = a0 * g0
            c1 = a1 * g1
            c2 = a0 * g1
            c3 = a1 * A
            if compensated:
                c0l = a0lo * g0
                c1l = a1lo * g1
                c2l = a0lo * g1
                c3l = a1lo * A

            if explicit:
                dP0 = uP - p
                B = jnp.exp(-(dP0 * dP0) * (0.5 * ily2))
                if compensated:
                    P = p - csum((c0 + c1 * dP0) * B,
                                 (c0l + c1l * dP0) * B)
                else:
                    P = p - rsum((c0 + c1 * dP0) * B)
            else:
                # aux warm start — q- and p-factors fused into ONE exp
                dqa = auxq - q
                sa, _, _ = _sfactors(aux_kind, dqa, alx, afreq)
                dpa = auxp - p
                st = sa + (dpa * dpa) * (0.5 / (aly * aly))
                mean = rsum_aux(auxa * jnp.exp(-st))
                P = mean + delta * p
                c0i = c0 * ily2
                c1i = c1 * ily2

                def newton(_, P):
                    dP = uP - P
                    dP2 = dP * dP
                    B = jnp.exp(-dP2 * (0.5 * ily2))
                    if compensated:
                        # the converged P satisfies f(P) = 0, so the
                        # residual's accuracy bounds the answer's; the
                        # derivative fp only steers convergence and
                        # stays a plain sum
                        f = csum((c0 + c1 * dP) * B,
                                 (c0l + c1l * dP) * B) - p + P
                    else:
                        f = rsum((c0 + c1 * dP) * B) - p + P
                    fp = rsum((c0i * dP + c1i * dP2 - c1) * B) + 1.0
                    Pn = P - f / fp
                    return jnp.where(jnp.isfinite(Pn), Pn, P)

                P = jax.lax.fori_loop(0, iters, newton, P)

        if loss_check and not loss_at_new_q:
            P = jnp.where(_tokamak_lost(P, q), jnp.nan, P)

        dPc = P - p  # unwrapped momentum increment (pdiff)
        Pw = jnp.where(mod_p > 0.0, P - jnp.floor(P / mod_p) * mod_p, P)

        # ---- q update at the (wrapped) solved momentum ----
        dP = uP - Pw
        dP2 = dP * dP
        B = jnp.exp(-dP2 * (0.5 * ily2))
        h = ily2 - dP2 * ily2 * ily2
        if kind == 3:
            if compensated:
                dq = csum(a1 * h * B, a1lo * h * B)
            else:
                dq = rsum(a1 * h * B)
        elif compensated:
            dq = csum((c2 * dP + c3 * h) * B, (c2l * dP + c3l * h) * B)
        else:
            dq = rsum((c2 * dP + c3 * h) * B)
        Q = q + dq
        Q = jnp.where(mod_q > 0.0, Q - jnp.floor(Q / mod_q) * mod_q, Q)

        if loss_check and loss_at_new_q:
            # Split driver: boundary checked at the NEW angle
            # (python/05_tokamak/Split_SympGPR/func.py loss handling)
            lost = _tokamak_lost(Pw, Q)
            Pw = jnp.where(lost, jnp.nan, Pw)
        Q = jnp.where(jnp.isfinite(Pw), Q, jnp.nan)
        Q_out[pl.ds(i, 1), :] = Q
        P_out[pl.ds(i, 1), :] = Pw
        pd = pd + dPc
        if track_pdiff:
            D_out[pl.ds(i, 1), :] = pd
        return (Q, Pw, pd)

    jax.lax.fori_loop(1, nm, map_step, (q, p, p))


def _tokamak_lost(P, th):
    """Tokamak loss boundary: r from pth = Ath(r, th) (20-iter Newton,
    fieldlines.f90:94-107); lost when r > 0.5 or P < 0.  cos(th) is
    loop-invariant — hoisted (it was 36% of the whole rollout when
    evaluated inside the iteration)."""
    pth = P * 1e-2
    ct = jnp.cos(th)

    def rit(_, r):
        y = pth - (r * r / 2.0 - r * r * r / 3.0 * ct)
        dy = -(r - r * r * ct)
        return r - y / dy

    r = jax.lax.fori_loop(0, 20, rit, jnp.full_like(P, 0.3))
    return (r > 0.5) | (P < 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "aux_kind", "iters", "nm", "loss_check",
                     "loss_at_new_q", "explicit", "track_pdiff", "n_maps",
                     "ns", "nas", "mxu_reduce", "compensated", "interpret"),
)
def _rollout_call(pm_arrays, q0g, p0g, kind, aux_kind, iters, nm,
                  loss_check, loss_at_new_q, explicit, track_pdiff,
                  n_maps, ns, nas, mxu_reduce, compensated, interpret):
    uq, uP, a0, a1, a0lo, a1lo, auxq, auxp, auxa, scal = pm_arrays
    G = q0g.shape[0]
    nm_pad = -(-nm // 8) * 8

    kernel = functools.partial(
        _rollout_kernel, kind=kind, aux_kind=aux_kind, iters=iters, nm=nm,
        loss_check=loss_check, loss_at_new_q=loss_at_new_q,
        explicit=explicit, track_pdiff=track_pdiff, n_maps=n_maps,
        ns=ns, nas=nas, mxu_reduce=mxu_reduce, compensated=compensated,
    )

    def full(a):
        return pl.BlockSpec(a.shape, lambda g: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    traj = pl.BlockSpec((nm_pad, LANE_TILE), lambda g: (0, g),
                        memory_space=pltpu.VMEM)
    n_out = 3 if track_pdiff else 2
    # VMEM budget: the default Mosaic scoped-vmem cap (~16 MB) rejects
    # training sets beyond ns~2048 even though v5e has 128 MB of VMEM —
    # the per-step working set is ~12 live (ns, 128) f32 intermediates
    # plus the (nm_pad, 128) trajectory blocks.  Raise the cap to the
    # estimated footprint (x2 margin for Mosaic double-buffering),
    # clamped to 100 MB; see docs/DESIGN.md "VMEM budget" for the rule.
    # Only override when the estimate exceeds the default cap: on this
    # backend passing vmem_limit_bytes for small working sets (ns<=1024)
    # makes Mosaic emit a kernel that faults the TPU worker at runtime
    # (reproduced at any cap value 32-100 MB; the same kernel runs fine
    # with the default cap).  Large sets both need and tolerate it.
    # Gate boundary verified on v5e hardware (round 5): ns in
    # {1536, 1792, 2048, 2560} — spanning est 12-20 MB, i.e. both sides
    # of the gate and of the default cap — all run with finite output
    # under exactly this gating.
    est = (16 * n_maps * ns * LANE_TILE * 4
           + 2 * n_out * nm_pad * LANE_TILE * 4)
    vmem_cap = (min(100 * 1024 * 1024, 2 * est)
                if est > 14 * 1024 * 1024 else None)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full(uq), full(uP), full(a0), full(a1),
            full(a0lo), full(a1lo),
            full(auxq), full(auxp), full(auxa),
            full(q0g), full(p0g),
        ],
        out_specs=(traj,) * n_out,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nm_pad, G * LANE_TILE), q0g.dtype)
            for _ in range(n_out)
        ),
        interpret=interpret,
        compiler_params=None if (interpret or vmem_cap is None)
        else pltpu.CompilerParams(vmem_limit_bytes=vmem_cap),
    )(scal, uq, uP, a0, a1, a0lo, a1lo, auxq, auxp, auxa, q0g, p0g)
    return tuple(o[:nm] for o in outs)


def rollout_in_kernel(
    pm: PackedModels, q0: Array, p0: Array, nm: int, iters: int = 5,
    loss_check: bool = False, loss_at_new_q: bool = False,
    explicit: bool = False, track_pdiff: bool = False,
    mxu_reduce: bool = False, compensated: bool = False,
    interpret: bool = False,
):
    """Full nm-step rollout in ONE pallas_call (trajectory included).

    iters=5 default: from the aux-GP warm start the Newton update is
    quadratically convergent and hits f32 roundoff in <=4 iterations
    (measured one-step max|dP| vs a 16-iteration solve: 7.6e-6 at 4, the
    same magnitude as the 8-vs-16 summation noise); 5 keeps one iteration
    of margin and is ~17% faster end-to-end than 8.

    ``compensated`` runs every posterior reduction through a double-f32
    TwoSum tree (``_comp_rsum``): near-f64 per-step accuracy at training
    jitter, where plain f32 sums of |alpha| ~ 1e3 terms carry ~1e-4
    cancellation noise (DESIGN.md section 4).

    B must be a multiple of 128.  VMEM per tile is ~(2-3) * nm * 128 * 4
    bytes; keep nm <= ~8000 per call (chunk longer rollouts with
    ``rollout_chunked``).  Returns (nm, B) trajectories: (Q, P) or
    (Q, P, pdiff) with ``track_pdiff``.
    """
    B = q0.shape[0]
    assert B % LANE_TILE == 0, f"batch {B} must be a multiple of {LANE_TILE}"
    G = B // LANE_TILE
    a0lo = pm.a0lo if pm.a0lo is not None else jnp.zeros_like(pm.a0)
    a1lo = pm.a1lo if pm.a1lo is not None else jnp.zeros_like(pm.a1)
    arrays = (pm.uq, pm.uP, pm.a0, pm.a1, a0lo, a1lo,
              pm.auxq, pm.auxp, pm.auxa, pm.scal)
    q0g = q0.reshape(G, LANE_TILE)
    p0g = p0.reshape(G, LANE_TILE)
    if pm.kind == 3:
        explicit = True
    return _rollout_call(arrays, q0g, p0g, pm.kind, pm.aux_kind,
                         iters, nm, loss_check, loss_at_new_q, explicit,
                         track_pdiff, pm.n_maps, pm.ns, pm.nas,
                         mxu_reduce, compensated, interpret)


def rollout_chunked(
    pm: PackedModels, q0: Array, p0: Array, nm: int, iters: int = 5,
    loss_check: bool = False, loss_at_new_q: bool = False,
    explicit: bool = False, track_pdiff: bool = False,
    mxu_reduce: bool = False, compensated: bool = False,
    interpret: bool = False, chunk: int = 4096,
):
    """Arbitrary-length rollout via VMEM-sized ``rollout_in_kernel`` chunks.

    The whole-rollout kernel keeps its (nm, 128) trajectory block in VMEM,
    which caps nm per call; this splits the time axis into ``chunk``-step
    kernel launches carrying (q, p) across, so long reference rollouts
    (e.g. the 10k-step tokamak runs, calc_fieldlines.py:19) still pay the
    scan dispatch floor only once per chunk instead of once per step.
    Returns (nm, B) trajectories like ``rollout_in_kernel``.
    """
    kw = dict(iters=iters, loss_check=loss_check,
              loss_at_new_q=loss_at_new_q, explicit=explicit,
              track_pdiff=track_pdiff, mxu_reduce=mxu_reduce,
              compensated=compensated, interpret=interpret)
    if pm.n_maps > 1:
        # chunk boundaries must preserve the i % n_maps sub-map phase
        chunk = max(pm.n_maps, chunk - ((chunk - 1) % pm.n_maps))
    if nm <= chunk:
        return rollout_in_kernel(pm, q0, p0, nm, **kw)
    # each n-row call emits the input state as row 0 and advances n-1 steps;
    # non-first chunks drop that duplicate row.  NaN-poisoned orbits carry
    # over naturally (NaN q/p stays NaN through the kernel).  The kernel's
    # pdiff restarts at the chunk's own p row 0, so later chunks are offset
    # by (total pdiff so far) - (chunk-start p), a per-orbit constant.
    outs: list[list[Array]] = []
    q, p = q0, p0
    pd_off = None
    rows = 0
    while rows < nm:
        n = min(chunk, nm - rows + (1 if rows else 0))
        res = rollout_in_kernel(pm, q, p, n, **kw)
        first = rows == 0
        sl = slice(None) if first else slice(1, None)
        if track_pdiff:
            Q, P, D = res
            D = D if pd_off is None else D + pd_off
            pd_off = D[-1] - P[-1]  # next chunk's pdiff starts at its p0
            outs.append([Q[sl], P[sl], D[sl]])
        else:
            Q, P = res
            outs.append([Q[sl], P[sl]])
        q, p = Q[-1], P[-1]
        rows += n if first else n - 1
    return tuple(jnp.concatenate([o[k] for o in outs], axis=0)
                 for k in range(len(outs[0])))


def rollout_pallas(
    sgp: SympGP | list[SympGP], aux: AuxGP | list[AuxGP | None] | None,
    q0: Array, p0: Array, nm: int, *,
    mod_q: float | None = 2.0 * np.pi, mod_p: float | None = None,
    iters: int = 5, explicit: bool = False, track_pdiff: bool = False,
    loss_check: bool = False, loss_at_new_q: bool = False,
    deployment_jitter: float | None = 1e-3,
    compensated: bool = False,
    interpret: bool | None = None, chunk: int = 4096,
):
    """Model-level fused rollout: any kernel variant, single or Split
    multi-map, arbitrary batch size and rollout length.

    Handles the full f32 deployment pipeline: host-side alpha
    re-conditioning (``SympGP.for_deployment``, an f64 Cholesky), f32
    cast, lane packing, NaN padding of the orbit batch to a multiple of
    128, the x64-off kernel trace, VMEM chunking of the time axis, and
    un-padding.  Returns (nm, B) trajectories (NaN rows for lost orbits):
    (Q, P), or (Q, P, pdiff) with ``track_pdiff``.

    ``interpret`` defaults to True on the CPU backend (tests) and False on
    an accelerator.  ``deployment_jitter=None`` skips re-conditioning (use
    when the model was already solved at a deployment-scale jitter).
    """
    from sympgpr_tpu.devices import host_fit, to_default_device

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    sgps = sgp if isinstance(sgp, (list, tuple)) else [sgp]
    auxes = (list(aux) if isinstance(aux, (list, tuple))
             else [aux] * len(sgps))

    with host_fit():
        if deployment_jitter is not None:
            sgps = [s.for_deployment(deployment_jitter) for s in sgps]
            auxes = [a.for_deployment(deployment_jitter)
                     if a is not None else None for a in auxes]
        # pack from the f64 models directly: _col rounds each column to
        # f32 and the a0lo/a1lo residual split needs the f64 originals
        pm = pack_models_split(sgps, auxes, mod_q=mod_q, mod_p=mod_p)
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
        outs = rollout_chunked(pm, q0p, p0p, nm, iters=iters,
                               loss_check=loss_check,
                               loss_at_new_q=loss_at_new_q,
                               explicit=explicit, track_pdiff=track_pdiff,
                               compensated=compensated,
                               interpret=interpret, chunk=chunk)
    return tuple(o[:, :B] for o in outs)
