"""Pallas fused map-step/rollout kernels vs the XLA fast path.

Runs in interpreter mode on CPU (the driver/TPU runs them compiled).  All
comparisons are at step horizon 1-2 where f32 summation-order noise has not
been amplified by chaotic divergence; statistical agreement over longer
horizons is asserted via finiteness/energy, not trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.gp.model import AuxGP, SympGP
from sympgpr_tpu.kernels import PER_SE, SE_SE
from sympgpr_tpu.maps import fast_apply as fa
from sympgpr_tpu.ops import pallas_step as ps


def f32_models(kernel, n=20, seed=0):
    """Well-conditioned f32 toy models: smooth targets + healthy jitter so
    |alpha| stays O(1) and f32 summation noise stays ~1e-6 (random targets
    with tiny jitter give |alpha| ~ 1e4 and meaningless f32 comparisons)."""
    rng = np.random.default_rng(seed)
    q = rng.uniform(0, 2 * np.pi, n)
    P = rng.uniform(-1, 1, n)
    X = jnp.asarray(np.stack([q, P], 1), jnp.float32)
    z = jnp.asarray(
        np.concatenate([0.1 * np.sin(q) * P, 0.1 * np.cos(q) + 0.05 * P]),
        jnp.float32,
    )
    params = jnp.asarray([0.9, 1.2], jnp.float32)
    sgp = SympGP.create(kernel, params, 1.5, 1e-2, X, z)
    p = rng.uniform(-1, 1, n)
    Xp = jnp.asarray(np.stack([q, p], 1), jnp.float32)
    zp = jnp.asarray(0.1 * np.sin(q) * p, jnp.float32)
    aux = AuxGP.create(kernel, params, 1.5, 1e-2, Xp, zp, delta=True)
    return sgp, aux


@pytest.mark.parametrize("kernel", [PER_SE, SE_SE], ids=lambda k: k.name)
def test_fused_step_matches_fast_path(kernel):
    sgp, aux = f32_models(kernel)
    pm = ps.pack_models(sgp, aux, mod_q=None)
    B = ps.TILE_B
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, B), jnp.float32)
    Q, P = ps.fused_map_step(pm, q, p, iters=8, interpret=True)

    co = fa.precompute_step(sgp, q)
    P0 = fa.aux_guess(aux, q, p)
    P_ref = fa.newton_P(co, p, P0, 1e-6, 8, True)
    Q_ref = q + fa.q_update(co, P_ref)
    # single step, well-conditioned toy model: f32 ordering noise only
    np.testing.assert_allclose(np.asarray(P), np.asarray(P_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Q), np.asarray(Q_ref), atol=2e-5)


def test_rollout_in_kernel_matches_stepwise():
    sgp, aux = f32_models(PER_SE)
    pm = ps.pack_models(sgp, aux, mod_q=2 * np.pi)
    B, nm = ps.LANE_TILE, 4
    rng = np.random.default_rng(2)
    q0 = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
    p0 = jnp.asarray(rng.uniform(-0.5, 0.5, B), jnp.float32)
    Q, P = ps.rollout_in_kernel(pm, q0, p0, nm, interpret=True)
    assert Q.shape == (nm, B)
    np.testing.assert_allclose(np.asarray(Q[0]), np.asarray(q0))

    q, p = q0, p0
    pad = jnp.zeros(ps.TILE_B - B, jnp.float32)
    for i in range(1, nm):
        qq = jnp.concatenate([q, pad])
        pp = jnp.concatenate([p, pad])
        Qs, Ps = ps.fused_map_step(pm, qq, pp, iters=5, interpret=True)
        q = jnp.mod(Qs[:B], 2 * np.pi)
        p = Ps[:B]
        np.testing.assert_allclose(np.asarray(P[i]), np.asarray(p),
                                   atol=5e-4)


def test_rollout_in_kernel_loss_check_poisons():
    """Loss boundary: orbits pushed far out must be NaN-poisoned."""
    sgp, aux = f32_models(PER_SE, seed=3)
    pm = ps.pack_models(sgp, aux, mod_q=2 * np.pi)
    B = ps.LANE_TILE
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
    # p ~ -0.5: P < 0 triggers the loss predicate immediately
    p0 = jnp.asarray(np.full(B, -0.5), jnp.float32)
    Q, P = ps.rollout_in_kernel(pm, q0, p0, 3, loss_check=True,
                                interpret=True)
    assert np.isnan(np.asarray(P[1])).all()
    assert np.isnan(np.asarray(Q[2])).all()


def test_pack_models_padding_is_inert():
    """Padded training lanes (zero alpha) must not change results."""
    sgp, aux = f32_models(PER_SE, n=20)
    pm = ps.pack_models(sgp, aux, mod_q=None)
    assert pm.uq.shape[1] == 128  # padded 20 -> 128
    B = ps.TILE_B
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, B), jnp.float32)
    Q, P = ps.fused_map_step(pm, q, p, interpret=True)
    assert np.isfinite(np.asarray(Q)).all()
    assert np.isfinite(np.asarray(P)).all()


def test_rollout_chunked_matches_single_call():
    """Chunked long rollout must be bitwise-identical to one kernel call
    (the carry is exactly the last emitted row, so the op sequence per
    step is unchanged)."""
    sgp, aux = f32_models(PER_SE, seed=5)
    pm = ps.pack_models(sgp, aux, mod_q=2 * np.pi)
    B, nm = ps.LANE_TILE, 11
    rng = np.random.default_rng(5)
    q0 = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
    p0 = jnp.asarray(rng.uniform(-0.5, 0.5, B), jnp.float32)
    Q1, P1 = ps.rollout_in_kernel(pm, q0, p0, nm, interpret=True)
    Q2, P2 = ps.rollout_chunked(pm, q0, p0, nm, interpret=True, chunk=4)
    assert Q2.shape == (nm, B)
    np.testing.assert_array_equal(np.asarray(Q1), np.asarray(Q2))
    np.testing.assert_array_equal(np.asarray(P1), np.asarray(P2))
