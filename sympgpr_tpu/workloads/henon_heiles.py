"""Workload 03: Henon-Heiles Poincare-section map.

Re-implements ``python/03_henon_heiles/main.py``: GP over successive section
points (q2, p2) scaled by 1e2, SE x SE (non-periodic) kernel, aux GP of
P - p, rollout without any angle wrap (``applymap_henon``,
``python/functions/func.py:239-260``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.gp.train import fit_auxgp, fit_sympgp
from sympgpr_tpu.kernels import SE_SE
from sympgpr_tpu.maps.symplectic import MapConfig, apply_map
from sympgpr_tpu.systems import henon_heiles as hh


def run(cfg: hh.HenonConfig = hh.HenonConfig(), nm: int | None = None,
        with_reference: bool = True, backend: str = "generic",
        ) -> dict[str, Any]:
    """backend: 'generic' (f64-capable lax.scan path) or 'pallas' (fused
    f32 whole-rollout kernel; SE x SE kernel, no angle wrap)."""
    nm = nm if nm is not None else cfg.nm
    from sympgpr_tpu.devices import host_fit, to_default_device

    with host_fit():  # f64 data-gen + small-N fits belong on the host
        z0 = hh.training_ics(cfg)
        pts, _ = hh.section_pairs(cfg, z0, 2)  # (2, N, 2) scaled
        q, p = pts[0, :, 0], pts[0, :, 1]
        Q, P = pts[1, :, 0], pts[1, :, 1]

        X = jnp.asarray(np.stack([q, P], 1))
        z = jnp.asarray(np.concatenate([p - P, Q - q]))
        Xp = jnp.asarray(np.stack([q, p], 1))
        zp = jnp.asarray(P - p)

        t0 = time.time()
        sigp = 2.0 * float(np.max(np.abs(np.asarray(zp))) ** 2)
        aux, _ = fit_auxgp(
            SE_SE, Xp, zp, sig2n=cfg.sig2_n, x0=(0.0, 0.0), fixed_sig=sigp,
            bounds=((-10, 1), (-10, 1)), delta=True,
        )
        sig = 2.0 * float(np.max(np.abs(np.asarray(z))) ** 2)
        sgp, res = fit_sympgp(
            SE_SE, X, z, sig2n=cfg.sig2_n, x0=(-1.0, -1.0), fixed_sig=sig,
            bounds=((-2, 2), (-2, 2)), tol=1e-8,
        )
        t_train = time.time() - t0
    aux, sgp = to_default_device(aux), to_default_device(sgp)

    z0t = hh.test_ics(cfg)
    q0 = z0t[:, 1] * cfg.scale
    p0 = z0t[:, 3] * cfg.scale
    t0 = time.time()
    if backend == "pallas":
        from sympgpr_tpu.maps.symplectic import Trajectory
        from sympgpr_tpu.ops import pallas_step as psk

        Q, P = psk.rollout_pallas(sgp, aux, q0, p0, nm, mod_q=None)
        traj = Trajectory(Q, P, None)
    else:
        map_cfg = MapConfig(mod_q=None, newton_tol=1e-12, newton_maxiter=20)
        traj = apply_map(sgp, aux, jnp.asarray(q0), jnp.asarray(p0), nm,
                         map_cfg)
    traj.q.block_until_ready()
    t_apply = time.time() - t0

    out: dict[str, Any] = dict(
        cfg=dataclasses.asdict(cfg),
        hyp=np.asarray(sgp.params),
        training_error=float(sgp.training_error()),
        t_train=t_train,
        t_apply=t_apply,
        traj=traj,
    )
    if with_reference:
        with host_fit():  # f64 reference integration on the host too
            ref_pts, counts = hh.section_pairs(cfg, z0t, min(nm, 8))
        out["ref_sections"] = ref_pts  # (cuts, Ntest, 2), scaled
        d = np.stack([np.asarray(traj.q[1]), np.asarray(traj.p[1])], -1)
        out["one_step_mse"] = float(
            np.nanmean(np.sum((d - ref_pts[0]) ** 2, -1) / 2)
        )
    return out


def main():
    out = run()
    print(f"lq={out['hyp'][0]:.2f} lp={out['hyp'][1]:.2f}")
    print(f"training error {out['training_error']:.1e}")
    if "one_step_mse" in out:
        print(f"one-step MSE (scaled coords): {out['one_step_mse']:.1e}")
    print(f"train {out['t_train']:.2f}s apply {out['t_apply']:.2f}s")


if __name__ == "__main__":
    main()
