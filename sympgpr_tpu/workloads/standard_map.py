"""Workload 04: Chirikov standard map, implicit and explicit methods.

Re-implements ``python/04_standard_map/main.py`` (k=2.0, N=20): implicit mode
uses the product periodic x SE kernel + Newton map; explicit mode uses the
separable sum kernel with per-block training of lq and lp
(``main.py:145-184``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.gp.train import fit_auxgp, fit_sympgp, fit_sympgp_separable
from sympgpr_tpu.kernels import PER_SE, SUM_PER_SE
from sympgpr_tpu.maps.symplectic import MapConfig, apply_map
from sympgpr_tpu.systems import standard_map as sys_map


def run(
    cfg: sys_map.StandardMapConfig = sys_map.StandardMapConfig(),
    method: str = "implicit",
    backend: str = "generic",
) -> dict[str, Any]:
    """backend: 'generic' (f64-capable lax.scan path) or 'pallas' (fused
    f32 whole-rollout kernel with in-kernel momentum wrap + pdiff)."""
    from sympgpr_tpu.devices import host_fit, to_default_device

    with host_fit():  # f64 data-gen + small-N fits belong on the host
        data = sys_map.training_data(cfg)
        X, z = jnp.asarray(data["X"]), jnp.asarray(data["z"])
        Xp, zp = jnp.asarray(data["Xp"]), jnp.asarray(data["zp"])
        sig = 2.0 * float(np.max(np.abs(data["z"])) ** 2)

        t0 = time.time()
        if method == "implicit":
            # aux GP of P-p over (q,p), sig fixed (main.py:89-105)
            sigp = 2.0 * float(np.max(np.abs(data["zp"])) ** 2)
            aux, _ = fit_auxgp(
                PER_SE, Xp, zp, sig2n=cfg.sig2_n, x0=(-1.0, -1.0),
                fixed_sig=sigp, bounds=((-10, 1), (-10, 1)), delta=True,
            )
            sgp, res = fit_sympgp(
                PER_SE, X, z, sig2n=cfg.sig2_n, x0=(0.0, -1.0),
                fixed_sig=sig, bounds=((-2, 2), (-2, 2)), tol=1e-8,
            )
            map_cfg = MapConfig(
                mod_q=2.0 * np.pi, mod_p=2.0 * np.pi, track_pdiff=True,
                newton_tol=1e-12, newton_maxiter=30,
            )
        elif method == "explicit":
            aux = None
            sgp, res = fit_sympgp_separable(
                SUM_PER_SE, X, z, sig2n=cfg.sig2_n, nll_sig2n=1e-8,
                x0_q=(1.0,), x0_p=(1.0,), fixed_sig=sig,
            )
            map_cfg = MapConfig(
                explicit=True, mod_q=None, mod_p=2.0 * np.pi,
                track_pdiff=True,
            )
        else:
            raise ValueError(method)
        t_train = time.time() - t0
    sgp = to_default_device(sgp)
    aux = to_default_device(aux) if aux is not None else None

    q0, p0 = sys_map.test_initial_conditions(cfg)
    t0 = time.time()
    if backend == "pallas":
        from sympgpr_tpu.maps.symplectic import Trajectory
        from sympgpr_tpu.ops import pallas_step as psk

        Qt, Pt, Dt = psk.rollout_pallas(
            sgp, aux, q0, p0, cfg.nm, mod_q=map_cfg.mod_q,
            mod_p=map_cfg.mod_p, track_pdiff=True, iters=8,
            deployment_jitter=1e-5,
        )
        traj = Trajectory(Qt, Pt, Dt)
    else:
        traj = apply_map(sgp, aux, jnp.asarray(q0), jnp.asarray(p0), cfg.nm,
                         map_cfg)
    traj.q.block_until_ready()
    t_apply = time.time() - t0

    # exact reference trajectories (main.py:78)
    q_ref, p_ref = sys_map.iterate(jnp.asarray(q0), jnp.asarray(p0), cfg.k,
                                   cfg.nm - 1)

    # one-step prediction error (the reference judges by eye from the
    # portraits; we add a quantitative gate)
    d1q = np.asarray(jnp.mod(traj.q[1], 2 * np.pi) - jnp.mod(q_ref[1], 2 * np.pi))
    d1q = np.minimum(np.abs(d1q), 2 * np.pi - np.abs(d1q))
    d1p = np.asarray(jnp.mod(traj.p[1], 2 * np.pi) - jnp.mod(p_ref[1], 2 * np.pi))
    d1p = np.minimum(np.abs(d1p), 2 * np.pi - np.abs(d1p))
    one_step_mse = float(np.mean(d1q**2 + d1p**2) / 2)

    return dict(
        cfg=dataclasses.asdict(cfg),
        method=method,
        hyp=np.asarray(sgp.params),
        sig=float(sgp.sig),
        training_error=float(sgp.training_error()),
        t_train=t_train,
        t_apply=t_apply,
        one_step_mse=one_step_mse,
        traj=traj,
        q_ref=np.asarray(q_ref),
        p_ref=np.asarray(p_ref),
    )


def run_large(
    n_train: int = 4096,
    nm: int = 200,
    steps: int = 60,
    lr: float = 5e-2,
    sig2n: float = 1e-2,
    aux_subsample: int = 512,
    k: float = 2.0,
) -> dict[str, Any]:
    """Large-N standard map: the SECOND physics system through the
    large-N pipeline (``tokamak_large`` is the first; VERDICT round-4
    item 1 generalized).

    The exact Chirikov iteration makes N-in-the-thousands training data
    free (``systems/standard_map.py::iterate``), so this isolates the
    fit/deploy side: on-device Adam over the closed-form value+grad
    (``gp.train.fit_sympgp_ondevice``), fused Pallas rollout with
    in-kernel momentum wrap + pdiff tracking, and the one-step MSE gate
    vs the exact map — the same quantitative gate as the reference-size
    driver above, so the rows are directly comparable.
    """
    import jax

    from sympgpr_tpu.devices import host_fit
    from sympgpr_tpu.gp.train import fit_sympgp_ondevice
    from sympgpr_tpu.ops import pallas_step as psk

    cfg = sys_map.StandardMapConfig(k=k, N=n_train, nm=nm)
    on_cpu = jax.default_backend() == "cpu"
    dtype = (jnp.float64 if (on_cpu and jax.config.jax_enable_x64)
             else jnp.float32)

    t0 = time.time()
    with host_fit():
        data = sys_map.training_data(cfg)
        na = min(aux_subsample, n_train)
        sigp = 2.0 * float(np.max(np.abs(data["zp"])) ** 2)
        aux, _ = fit_auxgp(
            PER_SE, jnp.asarray(data["Xp"][:na]),
            jnp.asarray(data["zp"][:na]), sig2n=1e-10, x0=(-1.0, -1.0),
            fixed_sig=sigp, bounds=((-10, 1), (-10, 1)), delta=True)
    t_datagen = time.time() - t0

    X = jnp.asarray(data["X"], dtype)
    z = jnp.asarray(data["z"], dtype)
    with jax.enable_x64(dtype == jnp.float64):
        model, hist, train_mse, timings = fit_sympgp_ondevice(
            PER_SE, X, z, sig2n=sig2n, steps=steps, lr=lr)

    q0, p0 = sys_map.test_initial_conditions(cfg)
    t0 = time.time()
    Qt, Pt, Dt = psk.rollout_pallas(
        model, aux, jnp.asarray(q0), jnp.asarray(p0), nm,
        mod_q=2.0 * np.pi, mod_p=2.0 * np.pi, track_pdiff=True,
        iters=8, deployment_jitter=None)
    float(jnp.nansum(Pt[-1]))
    t_apply = time.time() - t0

    q_ref, p_ref = sys_map.iterate(jnp.asarray(q0), jnp.asarray(p0),
                                   cfg.k, 1)
    d1q = np.asarray(jnp.mod(Qt[1], 2 * np.pi)
                     - jnp.mod(q_ref[1], 2 * np.pi))
    d1q = np.minimum(np.abs(d1q), 2 * np.pi - np.abs(d1q))
    d1p = np.asarray(jnp.mod(Pt[1], 2 * np.pi)
                     - jnp.mod(p_ref[1], 2 * np.pi))
    d1p = np.minimum(np.abs(d1p), 2 * np.pi - np.abs(d1p))
    one_step_mse = float(np.mean(d1q**2 + d1p**2) / 2)

    return {
        "N": n_train,
        "k": k,
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
        "one_step_mse": one_step_mse,
        "finite_frac": round(float(jnp.mean(
            jnp.isfinite(Pt[-1]).astype(jnp.float32))), 4),
        "n_test": len(q0),
    }


def main():
    for method in ("implicit", "explicit"):
        out = run(method=method)
        print(f"[{method}] lq={out['hyp'][0]:.2f} lp={out['hyp'][1]:.2f} "
              f"training error {out['training_error']:.1e} "
              f"one-step MSE {out['one_step_mse']:.1e} "
              f"train {out['t_train']:.2f}s apply {out['t_apply']:.2f}s")


if __name__ == "__main__":
    main()
