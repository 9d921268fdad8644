"""Native C++ runtime vs pure-JAX cross-checks (the equivalence-test role of
``python/05_tokamak/SympGPR/test_sympgpr.py`` in the reference)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu import native
from sympgpr_tpu.systems import henon_heiles as hh
from sympgpr_tpu.systems import tokamak as tk

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_ath_and_compute_r_match():
    assert native.compute_r(float(tk.Ath(0.22, 1.3, 0.0)), 1.3) == pytest.approx(
        0.22, rel=1e-12
    )
    np.testing.assert_allclose(
        native._lib().sympgpr_ath(0.2, 0.7), float(tk.Ath(0.2, 0.7, 0.0)),
        rtol=1e-14,
    )


def test_fieldlines_native_vs_jax():
    cfg = tk.TokamakConfig()
    rng = np.random.default_rng(0)
    npart = 4
    r0 = rng.uniform(0.12, 0.3, npart)
    th0 = rng.uniform(0, 2 * np.pi, npart)
    pth0 = np.array([float(tk.Ath(r, t, 0.0)) for r, t in zip(r0, th0)])
    z0 = np.stack([pth0, th0, np.zeros(npart)], axis=1)

    nsteps = 2 * cfg.nph  # two turns
    out_native = native.fieldlines_integrate(
        cfg.eps, cfg.mod_m, cfg.mod_n, 0.0, cfg.nph, nsteps, z0, r0
    )
    out_jax = np.asarray(
        tk.integrate_fieldlines(
            cfg.field, jnp.asarray(pth0), jnp.asarray(th0),
            jnp.zeros(npart), cfg.nph, nsteps, jnp.asarray(r0),
        )
    )
    # both solve the same midpoint residual to ~1e-13; agreement dominated
    # by Newton-variant differences, not chaos, over two turns
    np.testing.assert_allclose(out_native, out_jax, atol=1e-8)


def test_henon_native_vs_jax():
    cfg = hh.HenonConfig(N=6)
    z0 = hh.training_ics(cfg)[:6]
    cuts_n, tcuts_n, counts_n = native.henon_sections(z0, 2, lam=cfg.lam,
                                                      dt=cfg.dt)
    cuts_j, tcuts_j, counts_j = hh.integrate_sections(
        cfg, jnp.asarray(z0), int(4 * 7.5 / cfg.dt), 2
    )
    np.testing.assert_array_equal(counts_n, np.asarray(counts_j))
    np.testing.assert_allclose(cuts_n, np.asarray(cuts_j), atol=1e-9)
    np.testing.assert_allclose(tcuts_n, np.asarray(tcuts_j), atol=1e-9)


def test_native_faster_than_python_loop_reference():
    """The native generator exists to make host-side data gen cheap; sanity
    check it completes a full training-data-sized workload quickly."""
    import time

    cfg = tk.TokamakConfig()
    rng = np.random.default_rng(1)
    npart = 80
    r0 = rng.uniform(0.12, 0.3, npart)
    th0 = rng.uniform(0, 2 * np.pi, npart)
    pth0 = np.array([float(tk.Ath(r, t, 0.0)) for r, t in zip(r0, th0)])
    z0 = np.stack([pth0, th0, np.zeros(npart)], axis=1)
    t0 = time.time()
    native.fieldlines_integrate(cfg.eps, cfg.mod_m, cfg.mod_n, 0.0,
                                cfg.nph, cfg.nph * cfg.nturn, z0, r0)
    assert time.time() - t0 < 5.0
