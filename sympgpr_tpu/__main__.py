"""Command-line interface.

The reference has no CLI — each experiment is an edit-and-run ``main.py``
script with module-level constants (SURVEY.md section 5.6).  Here every
workload is a named command with its reference configuration as defaults:

  python -m sympgpr_tpu list
  python -m sympgpr_tpu run tokamak --nm 1000 --save-model model.npz
  python -m sympgpr_tpu run pendulum_implicit --plots out/
  python -m sympgpr_tpu sobol --n 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _setup_jax(x64: bool = True, platform: str | None = None):
    import jax

    from sympgpr_tpu.devices import ensure_cpu_backend

    if platform:
        jax.config.update("jax_platforms", platform)
    ensure_cpu_backend()  # keep a host backend for f64 data-gen/fits
    jax.config.update("jax_enable_x64", x64)


WORKLOADS = {}


def _register():
    from sympgpr_tpu.systems.henon_heiles import HenonConfig
    from sympgpr_tpu.systems.pendulum import PendulumConfig
    from sympgpr_tpu.systems.pert_pendulum import PertPendulumConfig
    from sympgpr_tpu.systems.standard_map import StandardMapConfig
    from sympgpr_tpu.systems.tokamak import TokamakConfig
    from sympgpr_tpu.workloads import (
        henon_heiles,
        pendulum_explicit,
        pendulum_implicit,
        pendulum_period_unknown,
        pert_pendulum,
        standard_map,
        tokamak,
    )

    WORKLOADS.update({
        "pendulum_implicit": (pendulum_implicit.run,
                              lambda a: PendulumConfig(nm=a.nm or 1000)),
        "pendulum_pallas": (
            lambda cfg: pendulum_implicit.run(cfg, backend="pallas"),
            lambda a: PendulumConfig(nm=a.nm or 1000)),
        "pendulum_explicit": (
            pendulum_explicit.run,
            lambda a: PendulumConfig(Nm=70, sig2_n=1e-10, nm=a.nm or 1000)),
        "pendulum_period_unknown": (
            pendulum_period_unknown.run,
            lambda a: PendulumConfig(N=50, Nm=100, sig2_n=1e-10,
                                     nm=a.nm or 1000)),
        "pert_pendulum": (pert_pendulum.run,
                          lambda a: PertPendulumConfig(nm=a.nm or 100)),
        "standard_map": (
            lambda cfg: standard_map.run(cfg, method="implicit"),
            lambda a: StandardMapConfig(nm=a.nm or 100)),
        "standard_map_explicit": (
            lambda cfg: standard_map.run(cfg, method="explicit"),
            lambda a: StandardMapConfig(nm=a.nm or 100)),
        "henon_heiles": (henon_heiles.run,
                         lambda a: HenonConfig(nm=a.nm or 500)),
        "henon_pallas": (
            lambda cfg: henon_heiles.run(cfg, backend="pallas"),
            lambda a: HenonConfig(nm=a.nm or 500)),
        "tokamak": (tokamak.run, lambda a: TokamakConfig(nm=a.nm or 1000)),
        "tokamak_pallas": (
            lambda cfg: tokamak.run(cfg, backend="pallas"),
            lambda a: TokamakConfig(nm=a.nm or 1000)),
        "tokamak_split": (
            lambda cfg: tokamak.run(cfg, optimizer="lbfgs"),
            lambda a: TokamakConfig(N=70, nphmap=4, nph=100, r_scale=0.38,
                                    qminmap=0.16, qmaxmap=0.31,
                                    nm=a.nm or 4000)),
    })


def _summarize(out: dict) -> dict:
    s = {}
    for k in ("training_error", "t_train", "t_apply", "one_step_mse",
              "period_ratio", "n_lost", "n_train", "method", "optimizer"):
        if k in out:
            s[k] = out[k]
    for k in ("Eosc", "gd", "Eosc_se"):
        if k in out:
            s[f"mean_{k}"] = float(np.nanmean(out[k]))
    if "hyp" in out:
        s["hyp"] = np.asarray(out["hyp"]).tolist()
    return s


def cmd_run(args):
    _setup_jax(platform=args.platform)
    _register()
    if args.workload not in WORKLOADS:
        sys.exit(f"unknown workload {args.workload!r}; "
                 f"available: {sorted(WORKLOADS)}")
    run_fn, cfg_fn = WORKLOADS[args.workload]
    out = run_fn(cfg_fn(args))
    print(json.dumps(_summarize(out), default=str))
    if args.plots and "traj" in out:
        from sympgpr_tpu import plotting

        os.makedirs(args.plots, exist_ok=True)
        traj = out["traj"]
        p = plotting.portrait(
            np.asarray(traj.q), np.asarray(traj.p),
            path=os.path.join(args.plots, f"{args.workload}_portrait.png"),
            title=args.workload,
        )
        print(f"wrote {p}")


def cmd_list(args):
    _register()
    for name in sorted(WORKLOADS):
        print(name)


def cmd_sobol(args):
    _setup_jax(platform=args.platform)
    from sympgpr_tpu import sensitivity

    qoi = sensitivity.tokamak_chaos_qoi(n_turns=args.turns)
    S1, ST, var = sensitivity.sobol_indices(
        qoi, bounds=[(0.0, 0.004), (0.0, 2 * np.pi)], n=args.n,
    )
    print(json.dumps({
        "params": ["eps", "phase"],
        "S1": S1.tolist(),
        "ST": ST.tolist(),
        "var": float(var),
    }))


def cmd_bench(args):
    import bench

    bench.main()


def main():
    ap = argparse.ArgumentParser(prog="sympgpr_tpu")
    ap.add_argument("--platform", default=None,
                    help="jax platforms override, e.g. 'cpu'")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run a workload")
    p_run.add_argument("workload")
    p_run.add_argument("--nm", type=int, default=None,
                       help="number of map applications")
    p_run.add_argument("--plots", default=None,
                       help="directory for portrait PNGs")
    p_run.set_defaults(fn=cmd_run)

    p_list = sub.add_parser("list", help="list workloads")
    p_list.set_defaults(fn=cmd_list)

    p_sobol = sub.add_parser("sobol", help="tokamak Sobol sensitivity")
    p_sobol.add_argument("--n", type=int, default=128)
    p_sobol.add_argument("--turns", type=int, default=30)
    p_sobol.set_defaults(fn=cmd_sobol)

    p_bench = sub.add_parser("bench", help="run the headline benchmark")
    p_bench.set_defaults(fn=cmd_bench)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
