"""Workload 01-period-unknown: learn the periodicity as a hyperparameter.

Re-implements ``python/01_pendulum/implicit_period_unknown/main.py`` (N=50,
Nm=100): both GPs use the ``per_se_freq`` kernel with a learned frequency;
the recovered periodicity is reported as ``0.5/freq`` (``main.py:124``:
frequency 0.5 corresponds to the true 2*pi period).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.eval import metrics
from sympgpr_tpu.gp.train import fit_auxgp, fit_sympgp
from sympgpr_tpu.kernels import PER_SE_FREQ
from sympgpr_tpu.maps.symplectic import MapConfig, apply_map
from sympgpr_tpu.systems import pendulum as sys_pend


def config() -> sys_pend.PendulumConfig:
    return sys_pend.PendulumConfig(N=50, Nm=100, sig2_n=1e-10)


def run(cfg: sys_pend.PendulumConfig | None = None,
        backend: str = "generic") -> dict[str, Any]:
    cfg = cfg or config()
    from sympgpr_tpu.devices import host_fit, to_default_device

    with host_fit():  # f64 data-gen + small-N fits belong on the host
        data = sys_pend.training_data(cfg)
        X, z = jnp.asarray(data["X"]), jnp.asarray(data["z"])
        Xp, zp = jnp.asarray(data["Xp"]), jnp.asarray(data["zp"])

        t0 = time.time()
        sigp = 2.0 * float(np.max(np.abs(data["zp"])) ** 2)
        aux, _ = fit_auxgp(
            PER_SE_FREQ, Xp, zp, sig2n=cfg.sig2_n, nll_sig2n=1e-6,
            x0=(0.0, 0.0, -1.0), fixed_sig=sigp, delta=False,
        )
        sig = 2.0 * float(np.max(np.abs(data["z"])) ** 2)
        sgp, res = fit_sympgp(
            PER_SE_FREQ, X, z, sig2n=cfg.sig2_n, x0=(-1.0, 0.0, -0.3),
            fixed_sig=sig,
        )
        t_train = time.time() - t0
    aux, sgp = to_default_device(aux), to_default_device(sgp)

    freq = float(np.abs(sgp.params[2]))
    period_ratio = 0.5 / freq  # 1.0 when the true 2*pi period is recovered

    q0, p0 = sys_pend.test_initial_conditions(cfg)
    t0 = time.time()
    if backend == "pallas":
        from sympgpr_tpu.maps.symplectic import Trajectory
        from sympgpr_tpu.ops import pallas_step as psk

        # per_se_freq kernel: the learned frequency rides the scal row
        Qt, Pt = psk.rollout_pallas(sgp, aux, q0, p0, cfg.nm,
                                    mod_q=2 * np.pi, iters=8,
                                    deployment_jitter=1e-5)
        traj = Trajectory(Qt, Pt, None)
    else:
        traj = apply_map(sgp, aux, jnp.asarray(q0), jnp.asarray(p0), cfg.nm,
                         MapConfig(newton_tol=1e-12, newton_maxiter=10))
    traj.q.block_until_ready()
    t_apply = time.time() - t0

    H = metrics.pendulum_energy(traj.q, traj.p, cfg.U0)
    return dict(
        cfg=dataclasses.asdict(cfg),
        hyp=np.asarray(sgp.params),
        freq=freq,
        period_ratio=period_ratio,
        training_error=float(sgp.training_error()),
        t_train=t_train,
        t_apply=t_apply,
        Eosc=np.asarray(metrics.energy_oscillation(H)),
        traj=traj,
    )


def main():
    out = run()
    print(f"lq={out['hyp'][0]:.2f} lp={out['hyp'][1]:.2f} "
          f"freq={out['freq']:.3f}")
    print(f"Recovered periodicity (x 2pi): {out['period_ratio']:.3f}")
    print(f"training error {out['training_error']:.1e}")
    print(f"Energy oscillation: {np.nanmean(out['Eosc']):.1e}")


if __name__ == "__main__":
    main()
