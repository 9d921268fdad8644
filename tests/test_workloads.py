"""Workload smoke + parity gates on reduced configurations.

Every reference experiment driver (SURVEY.md section 2.3) has a fast-config
equivalent here asserting its de-facto acceptance criterion (training error,
one-step MSE, energy oscillation).
"""

import numpy as np
import pytest

from sympgpr_tpu.systems.henon_heiles import HenonConfig
from sympgpr_tpu.systems.pendulum import PendulumConfig
from sympgpr_tpu.systems.pert_pendulum import PertPendulumConfig
from sympgpr_tpu.systems.standard_map import StandardMapConfig
from sympgpr_tpu.systems.tokamak import TokamakConfig
from sympgpr_tpu.workloads import (
    henon_heiles,
    pendulum_explicit,
    pendulum_period_unknown,
    pert_pendulum,
    standard_map,
    tokamak,
)


def test_standard_map_implicit():
    out = standard_map.run(StandardMapConfig(nm=20), method="implicit")
    assert out["training_error"] < 1e-10
    assert out["one_step_mse"] < 1e-5


def test_standard_map_explicit():
    out = standard_map.run(StandardMapConfig(nm=20), method="explicit")
    assert out["training_error"] < 1e-10
    assert out["one_step_mse"] < 1e-8


def test_pendulum_explicit():
    out = pendulum_explicit.run(PendulumConfig(Nm=70, sig2_n=1e-10, nm=100))
    assert out["training_error"] < 1e-10
    assert np.nanmean(out["Eosc"]) < 0.2


def test_pendulum_period_unknown():
    out = pendulum_period_unknown.run(
        PendulumConfig(N=50, Nm=100, sig2_n=1e-10, nm=100)
    )
    assert out["training_error"] < 1e-8
    # periodicity recovered as an integer multiple of the true 2*pi period
    ratio = out["period_ratio"]
    assert abs(ratio - round(ratio)) < 0.15 and 0.5 <= ratio <= 4.5
    assert np.nanmean(out["Eosc"]) < 1e-2


def test_pert_pendulum():
    out = pert_pendulum.run(PertPendulumConfig(nm=20))
    assert out["training_error"] < 1e-10
    assert out["one_step_mse"] < 1e-4


def test_henon_heiles():
    out = henon_heiles.run(HenonConfig(Ntest=10), nm=20)
    assert out["training_error"] < 1e-12
    assert out["one_step_mse"] < 1e-3  # scaled (1e2) coordinates


def test_tokamak_single():
    out = tokamak.run(TokamakConfig(N=40), nm=30)
    assert out["training_error"] < 1e-12
    assert np.nanmean(out["gd"]) < 1e-2
    assert out["n_lost"] <= out["cfg"]["Ntest"] // 3


@pytest.mark.slow
def test_tokamak_split():
    cfg = TokamakConfig(N=40, nphmap=4, nph=100, r_scale=0.38,
                        qminmap=0.16, qmaxmap=0.31)
    out = tokamak.run(cfg, nm=40)
    assert out["training_error"] < 1e-10
    assert np.nanmean(out["gd"]) < 1e-2


def test_tokamak_pallas_backend():
    """Fused-kernel backend (interpret mode on CPU) reproduces the workload.

    Median gd: the deployment conditioning trades a small interpolation
    bias for f32 robustness; with the weak N=40 model a single
    near-separatrix orbit can deviate, so the gate is on the bulk."""
    out = tokamak.run(TokamakConfig(N=40), nm=20, backend="pallas")
    assert np.nanmedian(out["gd"]) < 2e-2
    assert out["n_lost"] <= out["cfg"]["Ntest"] // 3


def test_pendulum_pallas_backend():
    """Fused-kernel backend (interpret mode on CPU): the f32 deployment-
    conditioned rollout sits at its measured noise floor (~8e-4), below
    the symplectic-Euler comparator's 1.1e-3; bitwise-critical pendulum
    runs use the f64 generic path (Eosc 6e-6)."""
    from sympgpr_tpu.workloads import pendulum_implicit

    out = pendulum_implicit.run(PendulumConfig(nm=30), backend="pallas",
                                with_reference=False, with_comparator=False)
    assert out["training_error"] < 1e-10
    assert float(np.nanmean(out["Eosc"])) < 2e-3


def test_pert_pendulum_pallas_backend():
    """Fused implicit map for the stroboscopic Poincare workload
    (interpret mode on CPU); one-step gate loosened for the f32 +
    deployment-conditioned path (generic f64 path: 1e-4)."""
    out = pert_pendulum.run(PertPendulumConfig(nm=20), backend="pallas")
    assert out["training_error"] < 1e-10
    assert out["one_step_mse"] < 1e-3


def test_henon_pallas_backend():
    """Fused SE x SE kernel without angle wrap (interpret mode on CPU)."""
    out = henon_heiles.run(HenonConfig(Ntest=10), nm=20, backend="pallas")
    assert out["training_error"] < 1e-12
    assert out["one_step_mse"] < 2e-3  # scaled coords, f32 path


def test_standard_map_pallas_backend():
    """Fused implicit map with in-kernel mod_p wrap + pdiff tracking."""
    out = standard_map.run(StandardMapConfig(nm=20), method="implicit",
                           backend="pallas")
    assert out["one_step_mse"] < 1e-4  # f32 + deployment conditioning
    assert out["traj"].pdiff is not None
    p = np.asarray(out["traj"].p[1:])
    assert np.nanmin(p) >= 0 and np.nanmax(p) < 2 * np.pi


def test_standard_map_explicit_pallas_backend():
    """Sum kernel -> Algorithm-2 explicit update inside the kernel."""
    out = standard_map.run(StandardMapConfig(nm=20), method="explicit",
                           backend="pallas")
    assert out["one_step_mse"] < 1e-5  # f32 + 1e-5 deployment conditioning


def test_pendulum_explicit_pallas_backend():
    out = pendulum_explicit.run(
        PendulumConfig(Nm=70, sig2_n=1e-10, nm=30), backend="pallas")
    assert np.nanmean(out["Eosc"]) < 0.2


def test_pendulum_period_unknown_pallas_backend():
    """per_se_freq kernel (learned frequency) in the fused kernel."""
    out = pendulum_period_unknown.run(
        PendulumConfig(N=50, Nm=100, sig2_n=1e-10, nm=30), backend="pallas")
    ratio = out["period_ratio"]
    assert abs(ratio - round(ratio)) < 0.15 and 0.5 <= ratio <= 4.5
    assert np.nanmean(out["Eosc"]) < 2e-2


@pytest.mark.slow
def test_tokamak_split_pallas_backend():
    """Split multi-map cycling inside the kernel, loss at the new angle."""
    cfg = TokamakConfig(N=40, nphmap=4, nph=100, r_scale=0.38,
                        qminmap=0.16, qmaxmap=0.31)
    out = tokamak.run(cfg, nm=40, backend="pallas")
    assert np.nanmedian(out["gd"]) < 2e-2


def test_tokamak_large_end_to_end():
    """Large-N tokamak driver at reduced N on the CPU backend (f64, XLA
    build, interpret rollout): real field-line data gen -> device Adam
    fit over the closed-form value+grad -> fused rollout -> the
    reference quality metrics all come out finite and sane.  The
    N=2048-4096 quality/timing row ships in the TPU bench artifact
    (VERDICT round-4 item 1)."""
    from sympgpr_tpu.workloads import tokamak_large

    out = tokamak_large.run(n_train=160, nm=12, steps=25,
                            aux_subsample=80, sig2n=1e-4)
    assert out["nll_decreased"], (out["nll_first"], out["nll_last"])
    assert np.isfinite(out["mean_Eosc"])
    assert out["n_lost"] == 0
    assert out["train_mse"] < 1e-2, out["train_mse"]
    assert np.isfinite(out["gd"])
    # the one-turn map must be in the right neighborhood even at this
    # tiny N / short fit (P is O(1e2)-scaled; gd is squared distance)
    assert out["gd"] < 5.0, out["gd"]


def test_tokamak_large_jitter_escalation():
    """A sig2n too small for f32 conditioning at scale must escalate
    (x10 per retry) instead of returning a NaN fit — the large-N analog
    of the reference's eigsh fallback (measured on v5e: N=4096 trains at
    1e-2, NaNs at 1e-3 without this)."""
    import jax.numpy as jnp

    from sympgpr_tpu.workloads.tokamak_large import fit_sympgp_large

    rng = np.random.default_rng(0)
    n = 48
    base = np.stack([rng.uniform(0, 2 * np.pi, n // 2),
                     rng.uniform(0.5, 6.0, n // 2)], 1)
    X = jnp.asarray(np.concatenate([base, base]), jnp.float32)  # singular K
    z = jnp.asarray(rng.normal(size=2 * n) * 0.1, jnp.float32)
    model, hist, mse, timings = fit_sympgp_large(
        X, z, sig2n=1e-12, theta0=(0.5, 2.5, 2.0), steps=5, lr=5e-2)
    assert timings["jitter_escalations"] >= 1
    assert timings["sig2n_used"] > 1e-12
    assert np.isfinite(hist[-1])


def test_standard_map_large_end_to_end():
    """Second physics system through the large-N pipeline: exact Chirikov
    data at reduced N on CPU, on-device-style fit, fused rollout with
    p-wrap + pdiff, one-step MSE gate vs the exact map."""
    out = standard_map.run_large(n_train=192, nm=10, steps=20,
                                 aux_subsample=96, sig2n=1e-4)
    assert out["nll_decreased"]
    assert out["one_step_mse"] < 1e-4, out["one_step_mse"]
    assert out["finite_frac"] == 1.0
