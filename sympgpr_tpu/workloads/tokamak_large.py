"""Large-N tokamak: the flagship PHYSICS workload trained at N in the
thousands of REAL field-line section crossings.

The reference caps the tokamak fit at N=80 crossings and a one-CPU LAPACK
factorization (``python/05_tokamak/SympGPR/calc_fieldlines.py:18-33``,
``main.py:62-78``); every large-N capability in this repo (Pallas tiled
covariance build, MXU Cholesky, closed-form gradient training, fused
VMEM rollout) previously ran only on a synthetic generating function
(``large_n.synthetic_training_set``).  This driver closes the
train -> apply -> QUALITY contract the reference ends every main.py with
(``main.py:80-89``: training MSE, then Poincare sections vs reference
orbits) at N = 2048-4096:

1. generate N real section crossings with the batched f64 field-line
   integrator on the host (``systems/tokamak.py::training_data``);
2. fit the symplectic GP at full N ON DEVICE (Adam over the closed-form
   ``nll_value_and_grad_theta``, f32 covariance + MXU Cholesky — the
   measured 2.44x-of-an-eval step of BENCH_r04);
3. fit the auxiliary warm-start GP on a Halton-prefix subsample on the
   host (its only job is the Newton initial guess; a low-discrepancy
   prefix covers the domain);
4. deploy through the fused Pallas rollout (``rollout_pallas``,
   loss-boundary masking fused in) for nm full turns of the reference's
   30 test orbits;
5. gate: per-orbit energy oscillation (Eosc), geometric distance of the
   first mapped section vs the f64 reference integration from the SAME
   ICs, and lost-orbit count — the exact metrics of the N=80 driver
   (``workloads/tokamak.py``), so the two rows are directly comparable.

Float32 note: the fit runs at a deployment-scale absolute jitter
(``sig2n``) so |alpha| stays O(1) and the f32 rollout is
cancellation-free (DESIGN.md section 4); the bounded interpolation bias
this trades in is exactly what the quality gates measure.

Run: ``python -m sympgpr_tpu run tokamak_large --n-train 4096`` or via
``bench.py`` (TPU).  Tested at reduced N on the CPU backend in
``tests/test_workloads.py``.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.eval import metrics
from sympgpr_tpu.kernels import PER_SE
from sympgpr_tpu.systems import tokamak as tk

Array = jax.Array


def fit_sympgp_large(X: Array, z: Array, sig2n: float, theta0,
                     steps: int, lr: float, max_jitter_tries: int = 7):
    """PER_SE convenience wrapper over the library-level on-device
    large-N fitter (``gp.train.fit_sympgp_ondevice`` — Adam scan over
    the closed-form value+grad, compile/run split, f32 jitter
    escalation)."""
    from sympgpr_tpu.gp.train import fit_sympgp_ondevice

    return fit_sympgp_ondevice(
        PER_SE, X, z, sig2n=sig2n, theta0=theta0, steps=steps, lr=lr,
        max_jitter_tries=max_jitter_tries)


def run(
    n_train: int = 4096,
    nm: int = 1000,
    steps: int = 40,
    lr: float = 5e-2,
    sig2n: float = 1e-2,
    aux_subsample: int = 512,
    theta0=(0.5, 2.5, 2.0),
    with_reference: bool = True,
    rollout_batch: int | None = None,
    compensated: bool = False,
    plots: str | None = None,
    with_f64_rollout: bool = False,
) -> dict[str, Any]:
    """End-to-end large-N tokamak: real data gen -> device fit -> fused
    rollout -> reference quality gates.  ``rollout_batch`` > Ntest adds a
    throughput measurement with the test ICs tiled to that batch."""
    from sympgpr_tpu.devices import host_fit
    from sympgpr_tpu.gp.train import fit_auxgp
    from sympgpr_tpu.ops import pallas_step as psk

    cfg = tk.TokamakConfig(N=n_train)
    on_cpu = jax.default_backend() == "cpu"
    dtype = (jnp.float64 if (on_cpu and jax.config.jax_enable_x64)
             else jnp.float32)

    # ---- 1. real section crossings, f64 on the host ----
    t0 = time.time()
    with host_fit():
        data = tk.training_data(cfg)
    t_datagen = time.time() - t0
    q, p = data["q"][:, 0], data["p"][:, 0]
    Q, P = data["Q"][:, 0], data["P"][:, 0]

    # ---- 2. aux warm-start GP on a Halton-prefix subsample (host) ----
    na = min(aux_subsample, n_train)
    with host_fit():
        aux, _ = fit_auxgp(
            PER_SE, jnp.asarray(np.stack([q[:na], p[:na]], 1)),
            jnp.asarray((P - p)[:na]), sig2n=1e-10, nll_sig2n=1e-8,
            x0=(-1.0, 0.0, 1.0), transform="log10", optimizer="lbfgs",
            delta=True)

    # ---- 3. device fit of the symplectic GP at full N ----
    X = jnp.asarray(np.stack([q, P], 1), dtype)
    z = jnp.asarray(np.concatenate([p - P, Q - q]), dtype)
    with jax.enable_x64(dtype == jnp.float64):
        model, hist, train_mse, timings = fit_sympgp_large(
            X, z, sig2n, theta0, steps, lr)

    # ---- 4. fused rollout of the reference test ICs ----
    (r0, th0), (r0p, th0p) = tk.test_initial_conditions(cfg)
    pth0, _ = tk.ics_to_pth(r0, th0)
    q0 = th0
    p0 = pth0 * float(cfg.momentum_scale)

    t0 = time.time()
    # alpha is already solved at the deployment-scale jitter: skip the
    # host-f64 re-conditioning re-solve of the (2N)^2 system
    Qt, Pt = psk.rollout_pallas(
        model, aux, jnp.asarray(q0), jnp.asarray(p0), nm,
        mod_q=2 * np.pi, loss_check=True, deployment_jitter=None,
        compensated=compensated)
    float(jnp.nansum(Pt[-1]))
    t_apply = time.time() - t0

    n_lost = int(np.sum(np.isnan(np.asarray(Pt[-1]))))
    H = jax.jit(jax.vmap(
        lambda qq, pp: tk.field_energy(cfg.field, qq, pp)))(Qt, Pt)
    Eosc = np.asarray(metrics.energy_oscillation(H, axis=0))

    out: dict[str, Any] = {
        "N": n_train,
        "nm": nm,
        "dtype": jnp.dtype(dtype).name,
        "sig2n": sig2n,
        "steps": steps,
        "t_datagen_s": round(t_datagen, 2),
        **timings,
        "t_apply_s": round(t_apply, 2),
        "nll_first": float(hist[0]),
        "nll_last": float(hist[-1]),
        "nll_decreased": bool(hist[-1] < hist[0]),
        "hyp": np.asarray(model.params).tolist() + [float(model.sig)],
        "train_mse": train_mse,
        "mean_Eosc": float(np.nanmean(Eosc)),
        "n_lost": n_lost,
        "n_test": len(q0),
    }

    if with_reference:
        with host_fit():
            ref_same = tk.reference_orbits(cfg, r0, th0, 1)
        qr = np.mod(np.asarray(ref_same[-1, :, 1]), 2 * np.pi)
        pr = np.asarray(ref_same[-1, :, 0]) * cfg.momentum_scale
        gd, stdgd = metrics.geometric_distance(
            Qt[1], Pt[1], jnp.asarray(qr, Qt.dtype),
            jnp.asarray(pr, Qt.dtype))
        out["gd"] = float(np.nanmean(np.asarray(gd)))
        out["stdgd"] = float(stdgd)

    if with_f64_rollout:
        # f64 host rollout of the SAME fitted model (generic scan path):
        # separates the map's intrinsic energy oscillation from the f32
        # kernel's summation noise — the "f64 rollout" row of the
        # DESIGN.md section 3 quality table
        import jax.tree_util as jtu

        from sympgpr_tpu.maps.symplectic import MapConfig, apply_map
        from sympgpr_tpu.workloads.tokamak import make_loss_fn

        def cast64(t):
            return jtu.tree_map(
                lambda a: jnp.asarray(a, jnp.float64)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                else a, t)

        with host_fit(), jax.enable_x64(True):
            traj64 = apply_map(
                cast64(model), cast64(aux),
                jnp.asarray(q0, jnp.float64),
                jnp.asarray(p0, jnp.float64), nm,
                MapConfig(newton_tol=1e-12, newton_maxiter=20),
                loss_pre=make_loss_fn(cfg, use_new_q=False))
            H64 = jax.vmap(
                lambda qq, pp: tk.field_energy(cfg.field, qq, pp)
            )(traj64.q, traj64.p)
            out["mean_Eosc_f64"] = float(jnp.nanmean(
                metrics.energy_oscillation(H64, axis=0)))
            out["n_lost_f64"] = int(np.sum(
                np.isnan(np.asarray(traj64.p[-1]))))

    if plots:
        # Poincare portrait vs the f64 reference sections — the visual
        # deliverable every reference main.py ends with
        # (python/05_tokamak/SympGPR/main.py plotting tail)
        import os

        from sympgpr_tpu import plotting

        os.makedirs(plots, exist_ok=True)
        # same ICs as the GP rollout so the overlay panel is a direct
        # structure comparison (the reference's plotting set is wider;
        # workloads/tokamak.py keeps that convention for the N=80 row)
        with host_fit():
            ref = tk.reference_orbits(cfg, r0, th0, max(nm // 4, 1))
        refs = np.asarray(ref[:: cfg.nph])  # one section point per turn
        out["portrait"] = plotting.portrait(
            np.mod(np.asarray(Qt), 2 * np.pi), np.asarray(Pt),
            np.mod(refs[:, :, 1], 2 * np.pi),
            refs[:, :, 0] * float(cfg.momentum_scale),
            path=os.path.join(plots,
                              f"tokamak_large_N{n_train}_portrait.png"),
            xlabel=r"$\theta$", ylabel=r"$p_\theta \cdot 10^2$",
            title=f"tokamak_large N={n_train}")

    if rollout_batch and rollout_batch > len(q0):
        reps = int(np.ceil(rollout_batch / len(q0)))
        qb = jnp.asarray(np.tile(q0, reps)[:rollout_batch])
        pb = jnp.asarray(np.tile(p0, reps)[:rollout_batch])
        nmb = min(nm, 256)
        Qb, Pb = psk.rollout_pallas(
            model, aux, qb, pb, nmb, mod_q=2 * np.pi, loss_check=True,
            deployment_jitter=None)
        float(jnp.nansum(Pb[-1]))  # warm
        dt = np.inf
        for _ in range(3):
            t0 = time.time()
            Qb, Pb = psk.rollout_pallas(
                model, aux, qb, pb, nmb, mod_q=2 * np.pi,
                loss_check=True, deployment_jitter=None)
            float(jnp.nansum(Pb[-1]))
            dt = min(dt, time.time() - t0)
        out["rollout_batch"] = rollout_batch
        out["rollout_steps_per_s"] = round(
            (nmb - 1) * rollout_batch / dt, 1)
    return out


def main():
    out = run()
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
