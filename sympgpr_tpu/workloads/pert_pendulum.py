"""Workload 02: perturbed pendulum Poincare map.

Re-implements ``python/02_pert_pendulum/main.py``: both GPs trained with
analytic-gradient L-BFGS over *linear* hyperparameters from (0.5, 0.5)
(``main.py:36-60``, jac=True — our gradients are autodiff everywhere), aux
targets are absolute P, rollout nm=100 with q wrapped mod 2*pi.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.gp.train import fit_auxgp, fit_sympgp
from sympgpr_tpu.kernels import PER_SE
from sympgpr_tpu.maps.symplectic import MapConfig, apply_map
from sympgpr_tpu.systems import pert_pendulum as sys_pp


def run(cfg: sys_pp.PertPendulumConfig = sys_pp.PertPendulumConfig(),
        with_reference: bool = True,
        backend: str = "generic") -> dict[str, Any]:
    """backend: 'generic' (f64-capable lax.scan path) or 'pallas' (fused
    f32 whole-rollout kernel, ``ops/pallas_step.py``)."""
    from sympgpr_tpu.devices import host_fit, to_default_device

    with host_fit():  # f64 data-gen + small-N fits belong on the host
        data = sys_pp.training_data(cfg)
        X, z = jnp.asarray(data["X"]), jnp.asarray(data["z"])
        Xp, zp = jnp.asarray(data["Xp"]), jnp.asarray(data["zp"])

        t0 = time.time()
        sigp = 2.0 * float(np.max(np.abs(data["zp"])) ** 2)
        aux, _ = fit_auxgp(
            PER_SE, Xp, zp, sig2n=cfg.sig2_n, x0=(0.5, 0.5), fixed_sig=sigp,
            transform="linear", delta=False,
        )
        sig = 2.0 * float(np.max(np.abs(data["z"])) ** 2)
        sgp, res = fit_sympgp(
            PER_SE, X, z, sig2n=cfg.sig2_n, x0=(0.5, 0.5), fixed_sig=sig,
            transform="linear",
        )
        t_train = time.time() - t0
    aux, sgp = to_default_device(aux), to_default_device(sgp)

    q0, p0 = sys_pp.test_initial_conditions(cfg)
    t0 = time.time()
    if backend == "pallas":
        from sympgpr_tpu.maps.symplectic import Trajectory
        from sympgpr_tpu.ops import pallas_step as psk

        # same re-conditioning jitter as the (equally smooth) plain
        # pendulum: 1e-5 keeps |alpha| ~ O(1) for f32 with minimal
        # interpolation bias (see pendulum_implicit.run)
        Q, P = psk.rollout_pallas(sgp, aux, q0, p0, cfg.nm,
                                  mod_q=2 * np.pi, deployment_jitter=1e-5)
        traj = Trajectory(Q, P, None)
    else:
        traj = apply_map(sgp, aux, jnp.asarray(q0), jnp.asarray(p0), cfg.nm,
                         MapConfig(newton_tol=1e-12, newton_maxiter=20))
    traj.q.block_until_ready()
    t_apply = time.time() - t0

    out: dict[str, Any] = dict(
        cfg=dataclasses.asdict(cfg),
        n_train=data["n_data"],
        hyp=np.asarray(sgp.params),
        training_error=float(sgp.training_error()),
        t_train=t_train,
        t_apply=t_apply,
        traj=traj,
    )
    if with_reference:
        with host_fit():  # f64 reference integration on the host too
            q_ref, p_ref = sys_pp.reference_orbits(cfg, q0, p0, cfg.nm)
        out["q_ref"], out["p_ref"] = q_ref, p_ref
        dq = np.asarray(traj.q[1]) - np.mod(q_ref[1], 2 * np.pi)
        dq = np.minimum(np.abs(dq), 2 * np.pi - np.abs(dq))
        dp = np.asarray(traj.p[1]) - p_ref[1]
        out["one_step_mse"] = float(np.mean(dq**2 + dp**2) / 2)
    return out


def main():
    out = run()
    print(f"Training data: {out['n_train']}")
    print(f"lq={out['hyp'][0]:.2f} lp={out['hyp'][1]:.2f}")
    print(f"training error {out['training_error']:.1e}")
    if "one_step_mse" in out:
        print(f"one-step MSE vs RK reference: {out['one_step_mse']:.1e}")
    print(f"train {out['t_train']:.2f}s apply {out['t_apply']:.2f}s")


if __name__ == "__main__":
    main()
