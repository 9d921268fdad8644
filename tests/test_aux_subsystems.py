"""Auxiliary subsystems: profiling, plotting diagnostics, distributed init."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_phase_timer():
    from sympgpr_tpu.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("work"):
        jnp.sum(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
    with t.phase("work"):
        pass
    rep = t.report()
    assert rep["work"]["calls"] == 2
    assert rep["work"]["total_s"] > 0


def test_cost_landscape(tmp_path):
    from sympgpr_tpu.plotting import cost_landscape

    obj = lambda t: (t[0] - 1.0) ** 2 + 2.0 * (t[1] + 0.5) ** 2
    path, g_ad, g_fd = cost_landscape(
        obj, [(-2, 2), (-2, 2)], path=str(tmp_path / "c.png"), n=10
    )
    assert os.path.exists(path)
    np.testing.assert_allclose(g_ad, g_fd, atol=1e-6)


def test_portrait_and_energy_plots(tmp_path):
    from sympgpr_tpu.plotting import energy_drift, portrait

    q = np.random.default_rng(0).uniform(0, 2 * np.pi, (50, 3))
    p = np.random.default_rng(1).normal(size=(50, 3))
    f1 = portrait(q, p, q, p, path=str(tmp_path / "p.png"))
    f2 = energy_drift(1.0 + 1e-6 * np.sin(np.arange(100.0)),
                      path=str(tmp_path / "e.png"))
    assert os.path.exists(f1) and os.path.exists(f2)


def test_initialize_noop_single_process():
    from sympgpr_tpu.distributed.init import initialize

    initialize(num_processes=1)  # must not raise


def test_sobol_indices_additive_model():
    """For f = a*x0 + b*x1 with uniform inputs, S1_i = Var_i / Var."""
    from sympgpr_tpu.sensitivity import sobol_indices

    def qoi(t):
        return 3.0 * t[0] + 1.0 * t[1]

    S1, ST, var = sobol_indices(qoi, [(0, 1), (0, 1)], n=512)
    expect = np.array([9.0, 1.0]) / 10.0
    np.testing.assert_allclose(S1, expect, atol=0.05)
    np.testing.assert_allclose(ST, expect, atol=0.05)
