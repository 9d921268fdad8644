"""Workload 05: tokamak field-line map (single and Split variants).

Re-implements ``python/05_tokamak/SympGPR/main.py`` (single map over one
toroidal turn) and ``python/05_tokamak/Split_SympGPR/main.py`` (nphmap=4
chained sub-maps, CMA-ES option) with the loss-boundary masking of
``python/05_tokamak/SympGPR/func.py:182-211``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.eval import metrics
from sympgpr_tpu.gp.train import fit_auxgp, fit_sympgp
from sympgpr_tpu.kernels import PER_SE
from sympgpr_tpu.maps.symplectic import (
    MapConfig,
    apply_map,
    apply_map_split,
    stack_models,
)
from sympgpr_tpu.systems import tokamak as tk


def _fit_one_split(q, p, Q, P, cfg: tk.TokamakConfig, optimizer: str):
    """Fit (aux, sympl) GPs for one sub-map, reference hyperparameters:
    aux log10 over (lq, lp, sig) from (0,0,1) with nll noise 1e-8
    (``main.py:37-41``); sympl linear over (lx, ly, sig) from (0.5, 0.5, 10)
    (``main.py:58-63``; Split CMA-ES from (0.5, 2.5, 2.0))."""
    Xp = jnp.asarray(np.stack([q, p], 1))
    zp = jnp.asarray(P - p)
    opt_kwargs = {}
    if optimizer == "cmaes":
        opt_kwargs = dict(sigma0=0.5, seed=0)
    aux, _ = fit_auxgp(
        PER_SE, Xp, zp, sig2n=cfg.sig2_n, nll_sig2n=1e-8, x0=(-1.0, 0.0, 1.0),
        transform="log10", optimizer=optimizer, delta=True, **opt_kwargs
    )

    X = jnp.asarray(np.stack([q, P], 1))
    z = jnp.asarray(np.concatenate([p - P, Q - q]))
    sgp, res = fit_sympgp(
        PER_SE, X, z, sig2n=cfg.sig2_n, x0=(0.5, 2.5 if optimizer == "cmaes" else 0.5,
                                            2.0 if optimizer == "cmaes" else 10.0),
        transform="linear", optimizer=optimizer, **opt_kwargs
    )
    return aux, sgp, res


def make_loss_fn(cfg: tk.TokamakConfig, use_new_q: bool):
    """Loss-region predicate: recover r from (P*1e-2, q) and poison orbits
    with r > 0.5 or P < 0 (``func.py:200-203``; Split checks at the new q and
    the sub-map's toroidal angle)."""
    field = cfg.field
    M = cfg.nphmap

    def loss_fn(q_old, q_new, P, i):
        q = q_new if use_new_q else q_old
        ph = (2.0 * np.pi / M) * jnp.mod(i + 1, M) if M > 1 else 0.0
        r = tk.compute_r(P * 1e-2, q, ph, jnp.full_like(P, 0.3))
        return (r > 0.5) | (P < 0.0)

    return loss_fn


def run(
    cfg: tk.TokamakConfig = tk.TokamakConfig(),
    optimizer: str = "lbfgs",
    nm: int | None = None,
    with_reference: bool = True,
    backend: str = "generic",
) -> dict[str, Any]:
    """backend: 'generic' (f64-capable lax.scan path) or 'pallas' (fused
    f32 rollout kernel, single map only; batch padded to 128)."""
    nm = nm if nm is not None else cfg.nm
    M = cfg.nphmap

    # f64 data-gen + small-N fits run on the host (TPU f64 is emulated and
    # ~20x slower here); models move to the accelerator for the rollout
    from sympgpr_tpu.devices import host_fit, to_default_device

    with host_fit():
        data = tk.training_data(cfg)

        t0 = time.time()
        auxes, sgps, fits = [], [], []
        for m in range(M):
            aux, sgp, res = _fit_one_split(
                data["q"][:, m], data["p"][:, m], data["Q"][:, m],
                data["P"][:, m], cfg, optimizer,
            )
            auxes.append(aux)
            sgps.append(sgp)
            fits.append(res)
        t_train = time.time() - t0

    (r0, th0), (r0p, th0p) = tk.test_initial_conditions(cfg)
    pth0, _ = tk.ics_to_pth(r0, th0)
    Q0 = jnp.asarray(th0)
    P0 = jnp.asarray(pth0) * cfg.momentum_scale

    t0 = time.time()
    if backend == "pallas":
        from sympgpr_tpu.maps.symplectic import Trajectory
        from sympgpr_tpu.ops import pallas_step as psk

        # f32 conditioning + packing + padding + x64-off kernel trace all
        # handled by the model-level entry (DESIGN.md section 4).  The Split
        # driver cycles the M sub-maps inside the kernel and checks the loss
        # boundary at the new angle (Split_SympGPR/func.py applymap_tok).
        Qt, Pt = psk.rollout_pallas(sgps, auxes, Q0, P0, nm,
                                    mod_q=2 * np.pi, loss_check=True,
                                    loss_at_new_q=(M > 1))
        traj = Trajectory(Qt, Pt, None)
    elif M == 1:
        map_cfg = MapConfig(newton_tol=1e-12, newton_maxiter=20)
        traj = apply_map(
            to_default_device(sgps[0]), to_default_device(auxes[0]),
            Q0, P0, nm, map_cfg,
            loss_pre=make_loss_fn(cfg, use_new_q=False),
        )
    else:
        map_cfg = MapConfig(newton_tol=1e-12, newton_maxiter=20)
        traj = apply_map_split(
            to_default_device(stack_models(sgps)),
            to_default_device(stack_models(auxes)), Q0, P0, nm, M, map_cfg,
            loss_post=make_loss_fn(cfg, use_new_q=True),
        )
    traj.q.block_until_ready()
    t_apply = time.time() - t0

    out: dict[str, Any] = dict(
        cfg=dataclasses.asdict(cfg),
        optimizer=optimizer,
        hyps=[np.asarray(s.params) for s in sgps],
        sigs=[float(s.sig) for s in sgps],
        training_error=float(np.mean([float(s.training_error())
                                      for s in sgps])),
        t_train=t_train,
        t_apply=t_apply,
        traj=traj,
        n_lost=int(np.sum(np.isnan(np.asarray(traj.p[-1])))),
    )

    # Energy oscillation on surviving orbit sections (one point per turn)
    sec_q = traj.q[:: max(M, 1)]
    sec_p = traj.p[:: max(M, 1)]
    H = jax.vmap(lambda q, p: tk.field_energy(cfg.field, q, p))(sec_q, sec_p)
    out["Eosc"] = np.asarray(metrics.energy_oscillation(H, axis=0))

    if with_reference:
        # reference orbits from the plotting IC set (one full turn per
        # section point), matching calc_fieldlines.py:110-125 — f64 host work
        with host_fit():
            n_turns = max(nm // M, 1)
            ref = tk.reference_orbits(cfg, r0p, th0p, n_turns)
            ref_same = tk.reference_orbits(cfg, r0, th0, 1)
        out["ref_sections"] = np.asarray(ref[:: cfg.nph])  # (n_turns+1, B, 3)
        # gd of the first mapped section point vs reference from the SAME ICs
        qr = np.mod(np.asarray(ref_same[-1, :, 1]), 2 * np.pi)
        pr = np.asarray(ref_same[-1, :, 0]) * cfg.momentum_scale
        gd, stdgd = metrics.geometric_distance(
            sec_q[1], sec_p[1], jnp.asarray(qr), jnp.asarray(pr)
        )
        out["gd"] = np.asarray(gd)
        out["stdgd"] = float(stdgd)

    return out


def main():
    out = run()
    print(f"training time {out['t_train']:.2f}s, "
          f"application time {out['t_apply']:.2f}s")
    print(f"training error {out['training_error']:.1e}")
    print(f"Energy oscillation: {np.nanmean(out['Eosc']):.1e}")
    if "gd" in out:
        print(f"Geometric distance: {np.nanmean(out['gd']):.1e} "
              f"± {out['stdgd']:.1e}")
    print(f"lost orbits: {out['n_lost']}/{out['cfg']['Ntest']}")


if __name__ == "__main__":
    main()
