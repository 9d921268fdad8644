"""Workload 01-explicit: pendulum with the separable sum kernel.

Re-implements ``python/01_pendulum/explicit/main.py`` (Nm=70, sig2_n=1e-10):
jointly trains (lq, lp) on the full derivative-observation NLL of the sum
kernel (unlike workload 04's per-block training) and applies the explicit
"Algorithm 2" map.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.eval import metrics
from sympgpr_tpu.gp.train import fit_sympgp
from sympgpr_tpu.kernels import SUM_PER_SE
from sympgpr_tpu.maps.symplectic import MapConfig, apply_map
from sympgpr_tpu.systems import pendulum as sys_pend


def config() -> sys_pend.PendulumConfig:
    return sys_pend.PendulumConfig(Nm=70, sig2_n=1e-10)


def run(cfg: sys_pend.PendulumConfig | None = None,
        backend: str = "generic") -> dict[str, Any]:
    cfg = cfg or config()
    from sympgpr_tpu.devices import host_fit, to_default_device

    with host_fit():  # f64 data-gen + small-N fit belong on the host
        data = sys_pend.training_data(cfg)
        X, z = jnp.asarray(data["X"]), jnp.asarray(data["z"])
        sig = 2.0 * float(np.max(np.abs(data["z"])) ** 2)

        t0 = time.time()
        sgp, res = fit_sympgp(
            SUM_PER_SE, X, z, sig2n=cfg.sig2_n, x0=(-1.0, -1.0),
            fixed_sig=sig,
        )
        t_train = time.time() - t0
    sgp = to_default_device(sgp)

    q0, p0 = sys_pend.test_initial_conditions(cfg)
    map_cfg = MapConfig(explicit=True)
    t0 = time.time()
    if backend == "pallas":
        from sympgpr_tpu.maps.symplectic import Trajectory
        from sympgpr_tpu.ops import pallas_step as psk

        # sum kernel -> Algorithm-2 explicit update inside the kernel
        Qt, Pt = psk.rollout_pallas(sgp, None, q0, p0, cfg.nm,
                                    mod_q=map_cfg.mod_q,
                                    deployment_jitter=1e-5)
        traj = Trajectory(Qt, Pt, None)
    else:
        traj = apply_map(sgp, None, jnp.asarray(q0), jnp.asarray(p0),
                         cfg.nm, map_cfg)
    traj.q.block_until_ready()
    t_apply = time.time() - t0

    H = metrics.pendulum_energy(traj.q, traj.p, cfg.U0)
    return dict(
        cfg=dataclasses.asdict(cfg),
        hyp=np.asarray(sgp.params),
        training_error=float(sgp.training_error()),
        t_train=t_train,
        t_apply=t_apply,
        Eosc=np.asarray(metrics.energy_oscillation(H)),
        traj=traj,
    )


def main():
    out = run()
    print(f"lq={out['hyp'][0]:.2f} lp={out['hyp'][1]:.2f}")
    print(f"training error {out['training_error']:.1e}")
    print(f"Energy oscillation: {np.nanmean(out['Eosc']):.1e}")
    print(f"train {out['t_train']:.2f}s apply {out['t_apply']:.2f}s")


if __name__ == "__main__":
    main()
