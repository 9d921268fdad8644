"""Differential tests vs the reference-architecture numpy/scipy baseline.

Plays the role of the reference's own equivalence suite
(``python/05_tokamak/SympGPR/test_sympgpr.py``: Python-vs-Fortran agreement
of builders/predictors at 1e-12 and short applymap runs at 1e-8): here the
JAX engine is checked against the independently-implemented numpy baseline
(``sympgpr_tpu/baselines/reference_cpu.py``) in float64.
"""

import jax.numpy as jnp
import numpy as np

from sympgpr_tpu.baselines import reference_cpu as ref
from sympgpr_tpu.gp.covariance import build_K, build_Kreg
from sympgpr_tpu.gp.model import AuxGP, SympGP
from sympgpr_tpu.kernels import PER_SE
from sympgpr_tpu.maps.symplectic import MapConfig, apply_map


def _setup(n=12, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = np.stack([q, P], 1)
    z = np.concatenate([0.3 * np.sin(q) * P, 0.2 * np.cos(q)])
    p = rng.uniform(-1, 1, n)
    Xp = np.stack([q, p], 1)
    zp = 0.3 * np.sin(q) * p
    lx, ly, sig, sig2n = 0.9, 1.2, 1.7, 1e-10
    m = ref.ReferenceStyleModel(X, z, lx, ly, sig, sig2n, Xp, zp,
                                1.0, 1.1, 1.3, aux_delta=True)
    sgp = SympGP.create(PER_SE, jnp.array([lx, ly]), sig, sig2n,
                        jnp.asarray(X), jnp.asarray(z))
    aux = AuxGP.create(PER_SE, jnp.array([1.0, 1.1]), 1.3, sig2n,
                       jnp.asarray(Xp), jnp.asarray(zp), delta=True)
    return m, sgp, aux


def test_build_K_agrees():
    m, sgp, _ = _setup()
    K_jax = np.asarray(build_K(PER_SE, sgp.X, sgp.X, sgp.params, sgp.sig))
    K_np = ref.build_K(m.X, m.X, m.lx, m.ly, m.sig)
    np.testing.assert_allclose(K_jax, K_np, rtol=1e-12, atol=1e-13)


def test_build_Kreg_agrees():
    m, _, aux = _setup()
    K_jax = np.asarray(build_Kreg(PER_SE, aux.X, aux.X, aux.params, aux.sig))
    K_np = ref.build_Kreg(m.Xp, m.Xp, m.lxp, m.lyp, m.sigp)
    np.testing.assert_allclose(K_jax, K_np, rtol=1e-12, atol=1e-13)


def test_predictors_agree():
    from sympgpr_tpu.maps.symplectic import dF_mean, guess_P

    m, sgp, aux = _setup()
    for q, P in [(0.5, 0.2), (2.5, -0.6), (5.0, 0.9)]:
        pGP_j, dq_j = np.asarray(dF_mean(sgp, jnp.array([q, P])))
        pGP_n, dq_n = ref._dF(m, q, P)
        np.testing.assert_allclose(pGP_j, pGP_n, rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(dq_j, dq_n, rtol=1e-11, atol=1e-13)
        g_j = float(guess_P(aux, jnp.asarray(q), jnp.asarray(P)))
        g_n = ref.guessP(m, q, P)
        np.testing.assert_allclose(g_j, g_n, rtol=1e-11)


def test_applymap_agrees():
    """Short rollout: batched masked-Newton scan vs per-orbit scipy loops."""
    m, sgp, aux = _setup()
    q0 = np.array([0.4, 1.7, 3.0, 5.2])
    p0 = np.array([0.1, -0.3, 0.5, 0.0])
    nm = 5
    q_np, p_np = ref.applymap(m, nm, q0, p0)
    cfg = MapConfig(newton_tol=1e-13, newton_maxiter=50)
    traj = apply_map(sgp, aux, jnp.asarray(q0), jnp.asarray(p0), nm, cfg)
    np.testing.assert_allclose(np.asarray(traj.q), q_np, rtol=1e-7,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(traj.p), p_np, rtol=1e-7,
                               atol=1e-8)


def test_model_artifact_roundtrip(tmp_path):
    from sympgpr_tpu.gp.model import load_models, save_models

    _, sgp, aux = _setup()
    path = str(tmp_path / "model.npz")
    save_models(path, sgp, aux, norm_scale=np.asarray(100.0))
    sgp2, aux2, extra = load_models(path)
    np.testing.assert_allclose(np.asarray(sgp2.alpha), np.asarray(sgp.alpha))
    np.testing.assert_allclose(np.asarray(aux2.L), np.asarray(aux.L))
    assert sgp2.kernel.name == "per_se"
    assert aux2.delta is True
    assert float(extra["norm_scale"]) == 100.0

    # loaded model drives the map identically
    from sympgpr_tpu.maps.symplectic import dF_mean

    v = jnp.array([1.0, 0.3])
    np.testing.assert_allclose(np.asarray(dF_mean(sgp2, v)),
                               np.asarray(dF_mean(sgp, v)), rtol=1e-14)


def test_for_deployment_conditioning():
    """Deployment re-solve shrinks |alpha| while keeping a bounded
    interpolation bias (the f32-quality knob; docs/DESIGN.md section 4)."""
    _, sgp, aux = _setup()
    dep = sgp.for_deployment(1e-3)
    assert float(jnp.max(jnp.abs(dep.alpha))) < float(
        jnp.max(jnp.abs(sgp.alpha)))
    # posterior still reproduces the targets to ~rel_jitter level
    from sympgpr_tpu.gp.covariance import build_K

    K = build_K(sgp.kernel, sgp.X, sgp.X, sgp.params, sgp.sig)
    err = float(jnp.mean((K @ dep.alpha - sgp.z) ** 2))
    assert err < 5e-3
    # hyperparameters untouched
    np.testing.assert_allclose(np.asarray(dep.params), np.asarray(sgp.params))
    dep_aux = aux.for_deployment(1e-3)
    assert np.isfinite(np.asarray(dep_aux.alpha)).all()
