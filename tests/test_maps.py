"""Unit tests for the batched map-application machinery."""

import jax
import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.gp.model import AuxGP, SympGP
from sympgpr_tpu.kernels import PER_SE, SUM_PER_SE
from sympgpr_tpu.maps import symplectic as sm


def toy_models(n=6, seed=0, kernel=PER_SE):
    rng = np.random.default_rng(seed)
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, P], 1))
    z = jnp.asarray(rng.normal(size=2 * n) * 0.1)
    sgp = SympGP.create(kernel, jnp.array([1.0, 1.0]), 1.0, 1e-10, X, z)
    Xp = jnp.asarray(np.stack([q, rng.uniform(-1, 1, n)], 1))
    zp = jnp.asarray(rng.normal(size=n) * 0.1)
    aux = AuxGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-10, Xp, zp,
                       delta=True)
    return sgp, aux


def test_dF_matches_reference_kstar_contraction():
    """dF_mean must equal the reference's Kstar^T (Kyinv z) construction
    (``python/01_pendulum/implicit/func.py:126-139``)."""
    sgp, _ = toy_models()
    v = jnp.array([1.3, 0.2])
    n = sgp.n_train

    # brute-force Kstar: rows = train derivative obs, cols = test components
    Kstar = np.zeros((2 * n, 2))
    for i in range(n):
        H = np.asarray(sgp.kernel.hess_uv(sgp.X[i], v, sgp.params))
        Kstar[i, :] = H[0, :]
        Kstar[n + i, :] = H[1, :]
    Kstar *= float(sgp.sig)
    expected = Kstar.T @ np.asarray(sgp.alpha)

    got = np.asarray(sm.dF_mean(sgp, v))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_newton_solves_residual():
    sgp, aux = toy_models()
    q = jnp.array([0.5, 1.5, 3.0])
    p = jnp.array([0.1, -0.2, 0.4])
    P = sm.calc_P(sgp, aux, q, p, tol=1e-13, maxiter=50)
    # residual at solution must vanish
    for i in range(3):
        f, _ = sm.p_residual_and_slope(sgp, q[i], P[i], p[i])
        assert abs(float(f)) < 1e-10


def test_newton_freezes_nan_lanes():
    sgp, aux = toy_models()
    q = jnp.array([0.5, jnp.nan])
    p = jnp.array([0.1, 0.3])
    P = sm.calc_P(sgp, aux, q, p)
    assert np.isfinite(float(P[0]))
    assert np.isnan(float(P[1]))


def test_explicit_matches_direct_evaluation():
    sgp, aux = toy_models(kernel=SUM_PER_SE)
    q = jnp.array([0.7, 2.0])
    p = jnp.array([0.3, -0.5])
    P = sm.calc_P_explicit(sgp, q, p)
    for i in range(2):
        pGP = float(sm.dF_mean(sgp, jnp.array([q[i], p[i]]))[0])
        np.testing.assert_allclose(float(P[i]), float(p[i]) - pGP, rtol=1e-12)


def test_explicit_equals_implicit_for_separable():
    """For a separable kernel the implicit solve must land on the explicit
    update (pGP independent of P)."""
    sgp, aux = toy_models(kernel=SUM_PER_SE)
    q = jnp.array([0.7, 2.0, 4.0])
    p = jnp.array([0.3, -0.5, 0.2])
    P_exp = sm.calc_P_explicit(sgp, q, p)
    P_imp = sm.calc_P(sgp, aux, q, p, tol=1e-14, maxiter=60)
    np.testing.assert_allclose(np.asarray(P_imp), np.asarray(P_exp),
                               rtol=1e-9, atol=1e-11)


def test_apply_map_shapes_and_ic_row():
    sgp, aux = toy_models()
    q0 = jnp.array([0.1, 0.2, 0.3, 0.4])
    p0 = jnp.array([0.0, 0.1, -0.1, 0.2])
    traj = sm.apply_map(sgp, aux, q0, p0, nm=7)
    assert traj.q.shape == (7, 4)
    np.testing.assert_allclose(traj.q[0], q0)
    np.testing.assert_allclose(traj.p[0], p0)
    assert np.all(np.isfinite(np.asarray(traj.p)))
    # q wrapped into [0, 2pi)
    assert float(jnp.max(traj.q)) < 2 * np.pi + 1e-12
    assert float(jnp.min(traj.q)) >= 0.0


def test_apply_map_loss_mask_poisons():
    sgp, aux = toy_models()
    q0 = jnp.array([0.1, 0.2])
    p0 = jnp.array([0.0, 0.1])

    def loss_pre(q_old, q_new, P, i):
        # lose orbit 1 from step 2 on
        return jnp.array([False, True]) & (i >= 2)

    traj = sm.apply_map(sgp, aux, q0, p0, nm=6, loss_pre=loss_pre)
    assert np.all(np.isfinite(np.asarray(traj.q[:, 0])))
    assert np.all(np.isnan(np.asarray(traj.q[4:, 1])))
    assert np.all(np.isnan(np.asarray(traj.p[4:, 1])))
    assert np.all(np.isfinite(np.asarray(traj.p[:2, 1])))


def test_apply_map_split_cycles_models():
    m1, a1 = toy_models(seed=0)
    m2, a2 = toy_models(seed=1)
    sgps = sm.stack_models([m1, m2])
    auxes = sm.stack_models([a1, a2])
    q0 = jnp.array([0.3])
    p0 = jnp.array([0.1])
    traj = sm.apply_map_split(sgps, auxes, q0, p0, nm=5, n_maps=2)
    assert traj.q.shape == (5, 1)
    # step 0 must match applying m1 alone for one step
    tr1 = sm.apply_map(m1, a1, q0, p0, nm=2)
    np.testing.assert_allclose(traj.q[1], tr1.q[1], rtol=1e-12)
    np.testing.assert_allclose(traj.p[1], tr1.p[1], rtol=1e-12)


def test_pdiff_tracks_unwrapped_momentum():
    """pdiff accumulates pre-wrap momentum increments
    (``python/04_standard_map/func.py:199,236-237``)."""
    sgp, aux = toy_models()
    q0 = jnp.array([0.5, 2.0])
    p0 = jnp.array([0.1, 0.3])
    cfg = sm.MapConfig(mod_p=2 * np.pi, track_pdiff=True,
                       newton_tol=1e-12, newton_maxiter=30)
    traj = sm.apply_map(sgp, aux, q0, p0, nm=6, cfg=cfg)
    assert traj.pdiff is not None
    # wrapped p and unwrapped pdiff agree modulo 2*pi at every step
    np.testing.assert_allclose(
        np.mod(np.asarray(traj.pdiff), 2 * np.pi),
        np.mod(np.asarray(traj.p), 2 * np.pi),
        atol=1e-9,
    )
    # and pdiff is genuinely unwrapped: increments are continuous
    inc = np.diff(np.asarray(traj.pdiff), axis=0)
    assert np.all(np.abs(inc) < 2 * np.pi)
