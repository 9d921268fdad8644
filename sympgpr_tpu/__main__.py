"""Command-line interface.

The reference has no CLI — each experiment is an edit-and-run ``main.py``
script with module-level constants (SURVEY.md section 5.6).  Here every
workload is a named command with its reference configuration as defaults:

  python -m sympgpr_tpu list
  python -m sympgpr_tpu run tokamak --nm 1000 --optimizer cmaes
  python -m sympgpr_tpu run pendulum_implicit --backend pallas --plots out/
  python -m sympgpr_tpu sample pendulum_implicit --sampler nuts --chains 8
  python -m sympgpr_tpu sobol --n 64
  python -m sympgpr_tpu bench --large-n --n 4096
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _setup_jax(x64: bool = True, platform: str | None = None):
    import jax

    from sympgpr_tpu.compcache import enable_compilation_cache
    from sympgpr_tpu.devices import ensure_cpu_backend

    if platform:
        jax.config.update("jax_platforms", platform)
    ensure_cpu_backend()  # keep a host backend for f64 data-gen/fits
    jax.config.update("jax_enable_x64", x64)
    enable_compilation_cache()


WORKLOADS = {}


def _register():
    """Each entry: name -> callable(args) running the workload.

    ``--optimizer``/``--backend`` flow through to workloads that accept
    them (reference defaults otherwise: the Split tokamak driver uses
    CMA-ES, ``python/05_tokamak/Split_SympGPR/main.py:25-45``).
    """
    from sympgpr_tpu.systems.henon_heiles import HenonConfig
    from sympgpr_tpu.systems.pendulum import PendulumConfig
    from sympgpr_tpu.systems.pert_pendulum import PertPendulumConfig
    from sympgpr_tpu.systems.standard_map import StandardMapConfig
    from sympgpr_tpu.systems.tokamak import TokamakConfig
    from sympgpr_tpu.workloads import (
        henon_heiles,
        large_n,
        pendulum_explicit,
        pendulum_implicit,
        pendulum_period_unknown,
        pert_pendulum,
        standard_map,
        tokamak,
    )

    def _backend(a, default="generic"):
        return a.backend or default

    WORKLOADS.update({
        "pendulum_implicit": lambda a: pendulum_implicit.run(
            PendulumConfig(nm=a.nm or 1000), backend=_backend(a)),
        "pendulum_pallas": lambda a: pendulum_implicit.run(
            PendulumConfig(nm=a.nm or 1000), backend=_backend(a, "pallas")),
        "pendulum_explicit": lambda a: pendulum_explicit.run(
            PendulumConfig(Nm=70, sig2_n=1e-10, nm=a.nm or 1000),
            backend=_backend(a)),
        "pendulum_period_unknown": lambda a: pendulum_period_unknown.run(
            PendulumConfig(N=50, Nm=100, sig2_n=1e-10, nm=a.nm or 1000),
            backend=_backend(a)),
        "pert_pendulum": lambda a: pert_pendulum.run(
            PertPendulumConfig(nm=a.nm or 100), backend=_backend(a)),
        "standard_map": lambda a: standard_map.run(
            StandardMapConfig(nm=a.nm or 100), method="implicit",
            backend=_backend(a)),
        "standard_map_explicit": lambda a: standard_map.run(
            StandardMapConfig(nm=a.nm or 100), method="explicit",
            backend=_backend(a)),
        "henon_heiles": lambda a: henon_heiles.run(
            HenonConfig(nm=a.nm or 500), backend=_backend(a)),
        "henon_pallas": lambda a: henon_heiles.run(
            HenonConfig(nm=a.nm or 500), backend=_backend(a, "pallas")),
        "tokamak": lambda a: tokamak.run(
            TokamakConfig(nm=a.nm or 1000),
            optimizer=a.optimizer or "lbfgs", backend=_backend(a)),
        "tokamak_pallas": lambda a: tokamak.run(
            TokamakConfig(nm=a.nm or 1000),
            optimizer=a.optimizer or "lbfgs",
            backend=_backend(a, "pallas")),
        # reference Split driver optimizes with CMA-ES
        # (python/05_tokamak/Split_SympGPR/main.py:25-45)
        "tokamak_split": lambda a: tokamak.run(
            TokamakConfig(N=70, nphmap=4, nph=100, r_scale=0.38,
                          qminmap=0.16, qmaxmap=0.31, nm=a.nm or 4000),
            optimizer=a.optimizer or "cmaes", backend=_backend(a)),
        # training-set sizes far beyond the reference; --distributed runs
        # the block-cyclic fit over every visible device (virtual CPU
        # mesh locally, real mesh on multi-chip hardware)
        "large_n": lambda a: (
            large_n.run_distributed(N=a.n or 1024,
                                    steps=a.steps or 20)
            if a.distributed else
            large_n.measure(N=a.n or 4096)),
        # the flagship physics workload at N in the thousands of REAL
        # field-line crossings: train on device, deploy through the fused
        # rollout, reference quality gates (workloads/tokamak_large.py)
        "tokamak_large": lambda a: __import__(
            "sympgpr_tpu.workloads.tokamak_large",
            fromlist=["run"]).run(
                n_train=a.n or 4096, nm=a.nm or 1000,
                steps=a.steps or 40, plots=a.plots,
                **({"sig2n": a.sig2n} if a.sig2n else {})),
        "standard_map_large": lambda a: standard_map.run_large(
            n_train=a.n or 4096, nm=a.nm or 200, steps=a.steps or 60,
            **({"sig2n": a.sig2n} if a.sig2n else {})),
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
    # the large-N pipeline is f32 (Mosaic rejects x64 loop indices) except
    # on a pure-CPU mesh, where run_distributed picks f64 itself
    x64 = not (args.workload == "large_n" and not args.distributed)
    _setup_jax(x64=x64, platform=args.platform)
    _register()
    if args.workload not in WORKLOADS:
        sys.exit(f"unknown workload {args.workload!r}; "
                 f"available: {sorted(WORKLOADS)}")
    out = WORKLOADS[args.workload](args)
    if args.workload in ("large_n", "tokamak_large",
                         "standard_map_large"):
        print(json.dumps(out, default=str))
        return
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


def _sample_problem(name: str):
    """(kernel, X, z, sig2n, nll_fn, x0_theta) for the NLL posterior of a
    workload's symplectic GP (log10 hyperparameters, sig last)."""
    import jax.numpy as jnp

    from sympgpr_tpu.gp import likelihood
    from sympgpr_tpu.kernels import PER_SE, PER_SE_FREQ

    if name in ("pendulum_implicit", "pendulum_period_unknown"):
        from sympgpr_tpu.systems import pendulum as sys_pend

        cfg = (sys_pend.PendulumConfig() if name == "pendulum_implicit"
               else sys_pend.PendulumConfig(N=50, Nm=100, sig2_n=1e-10))
        data = sys_pend.training_data(cfg)
        kern = PER_SE if name == "pendulum_implicit" else PER_SE_FREQ
        x0 = ([0.0, 0.0, 0.5] if kern is PER_SE
              else [0.0, 0.0, -0.3, 0.5])
        return (kern, jnp.asarray(data["X"]), jnp.asarray(data["z"]),
                cfg.sig2_n, likelihood.nll, np.asarray(x0))
    if name == "standard_map":
        from sympgpr_tpu.systems import standard_map as sys_map

        cfg = sys_map.StandardMapConfig()
        data = sys_map.training_data(cfg)
        return (PER_SE, jnp.asarray(data["X"]), jnp.asarray(data["z"]),
                cfg.sig2_n, likelihood.nll, np.asarray([0.0, -0.5, 0.5]))
    if name == "tokamak":
        from sympgpr_tpu.systems import tokamak as tk

        cfg = tk.TokamakConfig()
        data = tk.training_data(cfg)
        q, p = data["q"][:, 0], data["p"][:, 0]
        Q, P = data["Q"][:, 0], data["P"][:, 0]
        X = jnp.asarray(np.stack([q, P], 1))
        z = jnp.asarray(np.concatenate([p - P, Q - q]))
        return (PER_SE, X, z, cfg.sig2_n, likelihood.nll,
                np.asarray([-0.3, -0.3, 1.0]))
    sys.exit(f"no sampling posterior registered for {name!r}; "
             "available: pendulum_implicit, pendulum_period_unknown, "
             "standard_map, tokamak")


def cmd_sample(args):
    """HMC/NUTS over a workload's GP hyperparameter posterior.

    The reference infers hyperparameters only by point optimization; the
    BASELINE north star asks for NUTS/HMC over (l, sigma) sharded across
    chains — this exposes exactly that (chains sharded over every visible
    device when more than one is present).
    """
    _setup_jax(platform=args.platform)
    import jax
    import jax.numpy as jnp

    from sympgpr_tpu.gp import hmc as hmc_mod
    from sympgpr_tpu.gp import nuts as nuts_mod

    kern, X, z, sig2n, nll_fn, x0 = _sample_problem(args.workload)
    logprob = hmc_mod.nll_logprob(kern, X, z, sig2n, nll_fn)
    rng = np.random.default_rng(args.seed)
    x0s = jnp.asarray(x0[None, :] + 0.05 * rng.standard_normal(
        (args.chains, len(x0))))

    devs = jax.devices()
    use_mesh = len(devs) > 1 and args.chains % len(devs) == 0
    common = dict(n_warmup=args.warmup, seed=args.seed,
                  step_size=args.step_size)
    if args.sampler == "nuts":
        if use_mesh:
            from jax.sharding import Mesh

            res = nuts_mod.sample_nuts_sharded(
                logprob, x0s, Mesh(np.asarray(devs), ("chains",)),
                args.samples, **common)
        else:
            res = nuts_mod.sample_nuts(logprob, x0s, args.samples, **common)
        accept = res.accept_stat
        extra = {"mean_depth": float(np.mean(np.asarray(res.mean_depth))),
                 "divergences": int(np.sum(np.asarray(res.n_divergent)))}
    else:
        common["n_leapfrog"] = args.leapfrog
        common["adapt_step_size"] = True
        if use_mesh:
            from jax.sharding import Mesh

            res = hmc_mod.sample_hmc_sharded(
                logprob, x0s, Mesh(np.asarray(devs), ("chains",)),
                args.samples, **common)
        else:
            res = hmc_mod.sample_hmc(logprob, x0s, args.samples, **common)
        accept = res.accept_rate
        extra = {}

    samples = np.asarray(res.samples)  # (chains, n, dim) log10 theta
    flat = samples.reshape(-1, samples.shape[-1])
    hyp_names = ([f"l{i}" for i in range(samples.shape[-1] - 1)] + ["sig"])
    out = {
        "workload": args.workload,
        "sampler": args.sampler,
        "chains": int(samples.shape[0]),
        "samples_per_chain": int(samples.shape[1]),
        "accept_rate": float(np.mean(np.asarray(accept))),
        "theta_mean": dict(zip(hyp_names, flat.mean(0).round(4).tolist())),
        "theta_std": dict(zip(hyp_names, flat.std(0).round(4).tolist())),
        "hyp_posterior_mean": dict(
            zip(hyp_names, (10.0 ** flat).mean(0).round(5).tolist())),
        **extra,
    }
    print(json.dumps(out))
    if args.save:
        np.savez(args.save, samples=samples,
                 log_probs=np.asarray(res.log_probs))
        print(f"wrote {args.save}", file=sys.stderr)


def cmd_bench(args):
    if getattr(args, "rollout_sweep", False):
        _setup_jax(x64=False, platform=args.platform)
        from sympgpr_tpu.workloads import large_n

        out = large_n.rollout_sweep()
        print(json.dumps({"metric": "rollout_sweep", "detail": out}))
        return
    if args.large_n:
        # large-N pipeline only: covariance build + Cholesky + NLL/train
        # throughput (north-star "build + Cholesky GFLOP/s/chip").  x64 off:
        # the benchmark is f32 and Mosaic rejects x64's int64 indices.
        if args.distributed:
            _setup_jax(platform=args.platform)
            from sympgpr_tpu.workloads import large_n

            out = large_n.run_distributed(N=args.n, steps=args.steps or 20)
            print(json.dumps({
                "metric": "large_n_distributed_fit_s",
                "value": out["t_train_s"],
                "unit": "s",
                "detail": out,
            }))
            return
        _setup_jax(x64=False, platform=args.platform)
        from sympgpr_tpu.workloads import large_n

        out = large_n.measure(N=args.n, reps=args.reps)
        print(json.dumps({
            "metric": "large_n_build_plus_cholesky_gflops",
            "value": out["build_plus_chol_gflops"],
            "unit": "GFLOP/s/chip",
            "detail": out,
        }))
        return
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
    p_run.add_argument("--optimizer", default=None,
                       choices=("lbfgs", "cmaes", "adam"),
                       help="hyperparameter optimizer (workload default "
                            "otherwise; Split tokamak defaults to cmaes)")
    p_run.add_argument("--backend", default=None,
                       choices=("generic", "pallas"),
                       help="map-application backend")
    p_run.add_argument("--plots", default=None,
                       help="directory for portrait PNGs")
    p_run.add_argument("--n", type=int, default=None,
                       help="training-set size (large_n / *_large)")
    p_run.add_argument("--steps", type=int, default=None,
                       help="optimizer steps (large_n / *_large)")
    p_run.add_argument("--sig2n", type=float, default=None,
                       help="fit jitter for the *_large workloads "
                            "(escalates x10 automatically if f32 "
                            "conditioning rejects it)")
    p_run.add_argument("--distributed", action="store_true",
                       help="large_n: block-cyclic fit over all devices")
    p_run.set_defaults(fn=cmd_run)

    p_list = sub.add_parser("list", help="list workloads")
    p_list.set_defaults(fn=cmd_list)

    p_sobol = sub.add_parser("sobol", help="tokamak Sobol sensitivity")
    p_sobol.add_argument("--n", type=int, default=128)
    p_sobol.add_argument("--turns", type=int, default=30)
    p_sobol.set_defaults(fn=cmd_sobol)

    p_sample = sub.add_parser(
        "sample", help="HMC/NUTS over a workload's GP hyperposterior")
    p_sample.add_argument("workload")
    p_sample.add_argument("--sampler", default="nuts",
                          choices=("nuts", "hmc"))
    p_sample.add_argument("--chains", type=int, default=8)
    p_sample.add_argument("--samples", type=int, default=200)
    p_sample.add_argument("--warmup", type=int, default=200)
    p_sample.add_argument("--step-size", type=float, default=0.05)
    p_sample.add_argument("--leapfrog", type=int, default=16)
    p_sample.add_argument("--seed", type=int, default=0)
    p_sample.add_argument("--save", default=None,
                          help="write samples to this .npz")
    p_sample.set_defaults(fn=cmd_sample)

    p_bench = sub.add_parser("bench", help="run the headline benchmark")
    p_bench.add_argument("--large-n", action="store_true",
                         help="large-N build+Cholesky throughput only")
    p_bench.add_argument("--n", type=int, default=4096,
                         help="training-set size for --large-n")
    p_bench.add_argument("--reps", type=int, default=8)
    p_bench.add_argument("--distributed", action="store_true",
                         help="with --large-n: block-cyclic distributed "
                              "fit over all devices")
    p_bench.add_argument("--steps", type=int, default=None,
                         help="optimizer steps for --distributed")
    p_bench.add_argument("--rollout-sweep", action="store_true",
                         help="fused-rollout throughput vs training-set "
                              "size (spans the VMEM-cap regimes)")
    p_bench.set_defaults(fn=cmd_bench)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
