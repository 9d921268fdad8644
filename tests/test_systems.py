"""Physics data-generator tests (cross-integrator and invariant checks,
mirroring the reference's validation scripts, SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.systems import henon_heiles as hh
from sympgpr_tpu.systems import pendulum as pend
from sympgpr_tpu.systems import pert_pendulum as pp
from sympgpr_tpu.systems import standard_map as smap
from sympgpr_tpu.systems import tokamak as tk
from sympgpr_tpu.systems.halton import halton


def test_halton_first_points():
    """Plain Halton starting at index 1: (1/2, 1/3), (1/4, 2/3), ..."""
    pts = halton(4, 2)
    np.testing.assert_allclose(pts[0], [0.5, 1 / 3], rtol=1e-12)
    np.testing.assert_allclose(pts[1], [0.25, 2 / 3], rtol=1e-12)
    np.testing.assert_allclose(pts[2], [0.75, 1 / 9], rtol=1e-12)


def test_halton_uniformity():
    pts = halton(1000, 3)
    assert np.all(pts >= 0) and np.all(pts < 1)
    np.testing.assert_allclose(pts.mean(0), 0.5, atol=0.02)


def test_pendulum_rk4_vs_scipy():
    """Cross-integrator check: batched RK4 vs solve_ivp rtol 1e-13."""
    q0 = np.array([1.0, 2.5])
    p0 = np.array([0.5, -0.3])
    t = np.linspace(0, 0.2, 3)
    ref = pend.integrate_scipy(q0, p0, t)
    got = pend.integrate_rk4(jnp.asarray(q0), jnp.asarray(p0), 0.2, 2000)
    np.testing.assert_allclose(np.asarray(got), ref[:, :, -1].reshape(2, 2),
                               rtol=1e-10, atol=1e-12)


def test_pendulum_energy_conservation():
    q0 = jnp.array([2.0])
    p0 = jnp.array([0.5])
    traj = pend.integrate_rk4(q0, p0, 50.0, 50000, save_every=1000)
    from sympgpr_tpu.eval.metrics import pendulum_energy

    H = pendulum_energy(traj[..., 0], traj[..., 1])
    assert float(jnp.max(jnp.abs(H - H[0]))) < 1e-9


def test_standard_map_matches_direct():
    q, p = smap.iterate(jnp.array([1.0]), jnp.array([0.5]), 2.0, 2)
    # manual: p1 = 0.5 + 2 sin(1); q1 = 1 + p1
    p1 = 0.5 + 2 * np.sin(1.0)
    q1 = 1.0 + p1
    np.testing.assert_allclose(float(p[1, 0]), p1, rtol=1e-14)
    np.testing.assert_allclose(float(q[1, 0]), q1, rtol=1e-14)
    p2 = p1 + 2 * np.sin(q1)
    np.testing.assert_allclose(float(p[2, 0]), p2, rtol=1e-13)


def test_tokamak_safety_factor():
    """Unperturbed field: q(r) = 1/(1 - r^2/a^2) analytically (iota0=1)."""
    f0 = tk.TokamakField(eps=0.0)
    for r in (0.15, 0.25):
        qs = tk.safety_factor(f0, r, n_turns=20, nph=128)
        expected = 1.0 / (1.0 - r**2 / tk.A_MINOR**2)
        np.testing.assert_allclose(qs, expected, rtol=2e-3)


def test_tokamak_compute_r_roundtrip():
    r = jnp.asarray(0.22)
    th = jnp.asarray(1.3)
    pth = tk.Ath(r, th, 0.0)
    r2 = tk.compute_r(pth, th, 0.0, jnp.asarray(0.3))
    np.testing.assert_allclose(float(r2), 0.22, rtol=1e-12)


def test_tokamak_midpoint_residual_converges():
    f = tk.TokamakField()
    z = jnp.array([float(tk.Ath(0.2, 1.0, 0.0)), 1.0, 0.0])
    znew, _ = tk.timestep(f, 2 * np.pi / 32, z, jnp.asarray(0.2))
    res, _ = tk._tstep_residual(f, 2 * np.pi / 32, znew[:2], z,
                                jnp.asarray(0.2))
    assert float(jnp.max(jnp.abs(res))) < 1e-13


def test_tokamak_unperturbed_conserves_r():
    """eps=0: field lines lie on flux surfaces r = const.  The symplectic
    midpoint scheme keeps r within a bounded O(dph^2) oscillation (no secular
    drift) — same behavior as the reference integrator."""
    f0 = tk.TokamakField(eps=0.0)
    pth0 = float(tk.Ath(0.2, 0.7, 0.0))

    def max_drift(nph, turns=5):
        traj = tk.integrate_fieldlines(
            f0, jnp.array([pth0]), jnp.array([0.7]), jnp.zeros(1), nph,
            nph * turns, jnp.array([0.2]),
        )
        r = np.asarray(
            tk.compute_r(traj[:, 0, 0], traj[:, 0, 1], traj[:, 0, 2],
                         jnp.full(traj.shape[0], 0.2))
        )
        return np.abs(r - 0.2).max()

    d64 = max_drift(64)
    d128 = max_drift(128)
    assert d64 < 1e-4
    # second-order scheme: halving the step cuts the error ~4x
    assert d128 < d64 / 2.5


def test_henon_sections_on_section():
    cfg = hh.HenonConfig(N=8)
    z0 = hh.training_ics(cfg)
    cuts, _, count = hh.integrate_sections(cfg, jnp.asarray(z0), 3000, 2)
    assert int(count.min()) >= 2
    q1 = np.asarray(cuts)[..., 0]
    assert np.nanmax(np.abs(q1)) < 1e-12
    p1 = np.asarray(cuts)[..., 2]
    assert np.nanmin(p1) > 0  # rising crossings only


def test_henon_energy_at_cuts():
    cfg = hh.HenonConfig(N=8)
    z0 = hh.training_ics(cfg)
    cuts, _, _ = hh.integrate_sections(cfg, jnp.asarray(z0), 3000, 2)
    E0 = np.asarray(hh.energy(jnp.asarray(z0), cfg.lam))
    Ec = np.asarray(hh.energy(cuts, cfg.lam))
    assert np.nanmax(np.abs(Ec - E0[None, :])) < 1e-11


def test_pert_pendulum_stroboscope_unperturbed_is_pendulum():
    """e=0 reduces zdot to the om-pendulum; one period of the stroboscope
    must match direct integration."""
    cfg = pp.PertPendulumConfig(e=0.0)
    z = jnp.array([[0.4, 0.1]])
    out = pp.rk_pmap(z, 0.0, cfg.om, 2000)

    from scipy.integrate import solve_ivp

    def dydt(t, y):
        return [y[1], -cfg.om**2 * np.sin(y[0])]

    ref = solve_ivp(dydt, [0, 2 * np.pi], [0.4, 0.1], rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(out[0]), ref.y[:, -1], rtol=1e-8)


def test_tokamak_rk4_vs_midpoint_cross_integrator():
    """P10 parity: two independent discretizations of the perturbed
    field-line flow (explicit RK4 vs semi-implicit midpoint) must agree —
    the reference validates its Fortran integrator the same way
    (fieldlines_rk.py / fieldlines_mid.py vs fieldlines_fast.py)."""
    f = tk.TokamakField(eps=0.001)
    nph, nturn = 128, 3
    pth0 = jnp.asarray([float(tk.Ath(0.2, 0.5, 0.0)),
                        float(tk.Ath(0.3, 2.0, 0.0))])
    th0 = jnp.asarray([0.5, 2.0])
    ph0 = jnp.zeros(2)
    rl0 = jnp.asarray([0.2, 0.3])
    tr_mid = tk.integrate_fieldlines(f, pth0, th0, ph0, nph, nph * nturn, rl0)
    tr_rk = tk.integrate_fieldlines_rk4(f, pth0, th0, ph0, nph, nph * nturn,
                                        rl0)
    # agreement bounded by the midpoint rule's O(h^2) truncation error ...
    err1 = float(np.max(np.abs(np.asarray(tr_rk) - np.asarray(tr_mid))))
    assert err1 < 2e-4
    # ... and halving h shrinks the gap ~4x (2nd-order convergence toward
    # the same flow; a wrong term in either integrator would not converge)
    tr_mid2 = tk.integrate_fieldlines(f, pth0, th0, ph0, 2 * nph,
                                      2 * nph * nturn, rl0)
    tr_rk2 = tk.integrate_fieldlines_rk4(f, pth0, th0, ph0, 2 * nph,
                                         2 * nph * nturn, rl0)
    err2 = float(np.max(np.abs(np.asarray(tr_rk2[::2]) -
                               np.asarray(tr_mid2[::2]))))
    assert err2 < err1 / 3.0
    # and RK4 alone reproduces the analytic safety factor (unperturbed)
    f0 = tk.TokamakField(eps=0.0)
    tr = tk.integrate_fieldlines_rk4(
        f0, jnp.asarray([float(tk.Ath(0.25, 0.0, 0.0))]), jnp.zeros(1),
        jnp.zeros(1), 128, 128 * 20, jnp.asarray([0.25]))
    qs = float(tr[-1, 0, 2] - tr[0, 0, 2]) / float(tr[-1, 0, 1] - tr[0, 0, 1])
    np.testing.assert_allclose(qs, 1.0 / (1.0 - 0.25**2 / tk.A_MINOR**2),
                               rtol=2e-3)
