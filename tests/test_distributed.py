"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.distributed import sharded
from sympgpr_tpu.gp.likelihood import nll
from sympgpr_tpu.gp.model import AuxGP, SympGP
from sympgpr_tpu.kernels import PER_SE
from sympgpr_tpu.maps.symplectic import MapConfig, calc_P, calc_Q


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return sharded.make_mesh(jax.devices()[:8])


def _data(n=8, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    z = jnp.asarray(rng.normal(size=2 * n))
    return X, z


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "kp")


def test_sharded_nll_matches_dense(mesh):
    X, z = _data(8)
    params = jnp.array([0.9, 1.1])
    v_sharded = sharded.sharded_nll(
        PER_SE, mesh, params, jnp.asarray(2.0), jnp.asarray(1e-8), X, z
    )
    v_dense = nll(PER_SE, params, jnp.asarray(2.0), jnp.asarray(1e-8), X, z)
    # dense nll uses the closed-form build, sharded the autodiff build:
    # identical math, slightly different arithmetic order
    np.testing.assert_allclose(float(v_sharded), float(v_dense), rtol=1e-9)


def test_sharded_train_step_descends(mesh):
    X, z = _data(8)
    step = sharded.make_sharded_train_step(PER_SE, mesh, lr=1e-2)
    theta = jnp.array([0.0, 0.0, 0.3])
    vals = []
    for _ in range(5):
        theta, v = step(theta, X, z, jnp.asarray(1e-8))
        vals.append(float(v))
    assert vals[-1] < vals[0]


def test_sharded_map_step_matches_single_device(mesh):
    rng = np.random.default_rng(1)
    n = 6
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, P], 1))
    z = jnp.asarray(rng.normal(size=2 * n) * 0.1)
    sgp = SympGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-10, X, z)
    aux = AuxGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-10, X,
                       z[:n], delta=True)

    cfg = MapConfig(newton_tol=1e-12, newton_maxiter=30)
    B = 16  # divisible by dp axis
    q0 = jnp.asarray(rng.uniform(0, 2 * np.pi, B))
    p0 = jnp.asarray(rng.uniform(-0.5, 0.5, B))

    step = sharded.make_sharded_map_step(cfg, mesh)
    qs, ps = sharded.shard_orbits(mesh, q0, p0)
    Q_sh, P_sh = step(sgp, aux, qs, ps)

    P_ref = calc_P(sgp, aux, q0, p0, tol=1e-12, maxiter=30)
    Q_ref = jnp.mod(calc_Q(sgp, q0, P_ref) + q0, 2 * np.pi)
    np.testing.assert_allclose(np.asarray(P_sh), np.asarray(P_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Q_sh), np.asarray(Q_ref),
                               rtol=1e-10)


def test_fit_restarts_sharded(mesh):
    X, z = _data(8)

    def objective(theta):
        hyp = 10.0 ** theta
        return nll(PER_SE, hyp[:2], hyp[2], jnp.asarray(1e-8), X, z)

    x0s = [[0.0, 0.0, 0.3], [0.5, -0.5, 0.0], [-0.5, 0.5, 0.5],
           [0.2, 0.2, 0.2]] * 2
    theta, val = sharded.fit_restarts_sharded(objective, x0s, mesh, steps=50)
    assert np.isfinite(val)
    assert val <= float(objective(jnp.asarray(x0s[0]))) + 1e-9


def test_apply_map_sharded_matches_single(mesh):
    rng = np.random.default_rng(5)
    n = 6
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, P], 1))
    z = jnp.asarray(np.concatenate([0.2 * np.sin(q), 0.1 * np.cos(q) * P]))
    sgp = SympGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-10, X, z)
    aux = AuxGP.create(PER_SE, jnp.array([1.0, 1.0]), 1.0, 1e-10, X, z[:n],
                       delta=True)
    B = 16
    q0 = jnp.asarray(rng.uniform(0, 2 * np.pi, B))
    p0 = jnp.asarray(rng.uniform(-0.5, 0.5, B))
    cfg = MapConfig(newton_tol=1e-12, newton_maxiter=30)
    qs, ps = sharded.apply_map_sharded(mesh, sgp, aux, q0, p0, 8, cfg)
    from sympgpr_tpu.maps.symplectic import apply_map

    ref = apply_map(sgp, aux, q0, p0, 8, cfg)
    np.testing.assert_allclose(np.asarray(qs), np.asarray(ref.q), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ref.p), rtol=1e-10)


def test_rollout_in_kernel_sharded_matches_single(mesh):
    """The dp-sharded fused rollout is bitwise the single-device kernel
    on each orbit shard (orbit tiles are independent grid programs), and
    rejects batches that don't tile over devices x lanes."""
    from sympgpr_tpu.ops import pallas_step as ps

    rng = np.random.default_rng(7)
    n = 12
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, P], 1), jnp.float32)
    z = jnp.asarray(np.concatenate([0.1 * np.sin(q) * P,
                                    0.1 * np.cos(q)]), jnp.float32)
    params = jnp.asarray([0.9, 1.2], jnp.float32)
    sgp = SympGP.create(PER_SE, params, 1.5, 1e-2, X, z)
    aux = AuxGP.create(PER_SE, params, 1.5, 1e-2, X,
                       0.1 * jnp.sin(X[:, 0]), delta=True)
    pm = ps.pack_models(sgp, aux, mod_q=2 * np.pi)

    D = mesh.shape["dp"]
    B = D * ps.LANE_TILE
    q0 = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
    p0 = jnp.asarray(rng.uniform(-0.5, 0.5, B), jnp.float32)
    nm = 4
    Qs, Ps = sharded.rollout_in_kernel_sharded(
        mesh, pm, q0, p0, nm, interpret=True)
    Q1, P1 = ps.rollout_in_kernel(pm, q0, p0, nm, interpret=True)
    np.testing.assert_array_equal(np.asarray(Qs), np.asarray(Q1))
    np.testing.assert_array_equal(np.asarray(Ps), np.asarray(P1))

    with pytest.raises(ValueError, match="multiple"):
        sharded.rollout_in_kernel_sharded(
            mesh, pm, q0[: ps.LANE_TILE], p0[: ps.LANE_TILE], nm,
            interpret=True)
