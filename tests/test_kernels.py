"""Kernel derivative golden tests.

Cross-checks the autodiff derivative set against (a) independently
hand-transcribed closed forms of the reference's generated Fortran
(``python/05_tokamak/SympGPR/kernels.f90``) and (b) finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sympgpr_tpu.kernels import PER_SE, PER_SE_FREQ, SE_SE, SUM_PER_SE

KERNELS = [PER_SE, SE_SE, SUM_PER_SE, PER_SE_FREQ]


def params_for(kernel):
    return jnp.array([0.7, 1.3, 0.9])[: kernel.n_params]


def pts():
    u = jnp.array([0.3, -0.8])
    v = jnp.array([1.1, 0.25])
    return u, v


# -- independent numpy implementations (transcribed formulas, not autodiff)


def per_se_ref(u, v, lx, ly):
    dq, dP = u[0] - v[0], u[1] - v[1]
    return np.exp(-np.sin(0.5 * dq) ** 2 / (2 * lx**2) - dP**2 / (2 * ly**2))


def per_se_d2kdxdx0_ref(u, v, lx, ly):
    """d^2k/dq dq' for the product periodic x SE kernel, hand-derived.

    k = exp(-s(q-q')) * g(P-P') with s(d) = sin^2(d/2)/(2 lx^2):
    dk/dq = -s' k ; d2k/dq dq' = (s'' - s'^2) k  (since d/dq' = -d/dq on d).
    """
    d = float(u[0] - v[0])
    sp = np.sin(0.5 * d) * np.cos(0.5 * d) / (2 * lx**2)  # s'(d) = sin(d)/(4 lx^2)
    spp = np.cos(d) / (4 * lx**2)  # s''(d)
    k = per_se_ref(u, v, lx, ly)
    return (spp - sp**2) * k


def per_se_d2kdydy0_ref(u, v, lx, ly):
    dP = float(u[1] - v[1])
    k = per_se_ref(u, v, lx, ly)
    return (1.0 / ly**2 - dP**2 / ly**4) * k


def per_se_d2kdxdy0_ref(u, v, lx, ly):
    d = float(u[0] - v[0])
    dP = float(u[1] - v[1])
    sp = np.sin(0.5 * d) * np.cos(0.5 * d) / (2 * lx**2)
    k = per_se_ref(u, v, lx, ly)
    # d/dq -> -s' k ; then d/dP' -> (+dP/ly^2) factor
    return -sp * (dP / ly**2) * k


class TestGoldenPerSE:
    def test_value(self):
        u, v = pts()
        p = params_for(PER_SE)
        expected = per_se_ref(np.asarray(u), np.asarray(v), 0.7, 1.3)
        np.testing.assert_allclose(PER_SE.fn(u, v, p), expected, rtol=1e-14)

    def test_hessian_blocks(self):
        u, v = pts()
        p = params_for(PER_SE)
        H = PER_SE.hess_uv(u, v, p)
        np.testing.assert_allclose(
            H[0, 0], per_se_d2kdxdx0_ref(u, v, 0.7, 1.3), rtol=1e-13
        )
        np.testing.assert_allclose(
            H[1, 1], per_se_d2kdydy0_ref(u, v, 0.7, 1.3), rtol=1e-13
        )
        np.testing.assert_allclose(
            H[0, 1], per_se_d2kdxdy0_ref(u, v, 0.7, 1.3), rtol=1e-13
        )
        np.testing.assert_allclose(H[1, 0], H[0, 1], rtol=1e-13)


@pytest.mark.parametrize("kernel", KERNELS, ids=lambda k: k.name)
class TestFiniteDifference:
    def test_grad_u(self, kernel):
        u, v = pts()
        p = params_for(kernel)
        g = kernel.grad_u(u, v, p)
        eps = 1e-6
        for r in range(2):
            e = jnp.zeros(2).at[r].set(eps)
            fd = (kernel.fn(u + e, v, p) - kernel.fn(u - e, v, p)) / (2 * eps)
            np.testing.assert_allclose(g[r], fd, rtol=1e-6, atol=1e-9)

    def test_hess_uv(self, kernel):
        u, v = pts()
        p = params_for(kernel)
        H = kernel.hess_uv(u, v, p)
        eps = 1e-6
        for c in range(2):
            e = jnp.zeros(2).at[c].set(eps)
            fd = (
                kernel.grad_u(u, v + e, p) - kernel.grad_u(u, v - e, p)
            ) / (2 * eps)
            np.testing.assert_allclose(H[:, c], fd, rtol=1e-5, atol=1e-8)


def test_symmetry():
    u, v = pts()
    for kernel in KERNELS:
        p = params_for(kernel)
        np.testing.assert_allclose(
            kernel.fn(u, v, p), kernel.fn(v, u, p), rtol=1e-14
        )


def test_separable_cross_block_vanishes():
    """Sum kernel => d^2k/dq dP' == 0 identically (basis of Algorithm 2)."""
    u, v = pts()
    p = params_for(SUM_PER_SE)
    H = SUM_PER_SE.hess_uv(u, v, p)
    assert float(jnp.abs(H[0, 1])) == 0.0
    assert float(jnp.abs(H[1, 0])) == 0.0


def test_per_se_freq_reduces_to_per_se():
    """freq=0.5 recovers the fixed-period kernel
    (``python/01_pendulum/implicit_period_unknown/init_func.py:25``:
    sin(x*p) with p=0.5 == sin(x/2))."""
    u, v = pts()
    p3 = jnp.array([0.7, 1.3, 0.5])
    p2 = jnp.array([0.7, 1.3])
    np.testing.assert_allclose(
        PER_SE_FREQ.fn(u, v, p3), PER_SE.fn(u, v, p2), rtol=1e-14
    )
    np.testing.assert_allclose(
        PER_SE_FREQ.hess_uv(u, v, p3), PER_SE.hess_uv(u, v, p2), rtol=1e-13
    )


def test_periodicity():
    u, v = pts()
    p = params_for(PER_SE)
    shifted = u.at[0].add(2 * jnp.pi)
    np.testing.assert_allclose(
        PER_SE.fn(shifted, v, p), PER_SE.fn(u, v, p), rtol=1e-12
    )
