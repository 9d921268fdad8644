"""Kernel definitions for symplectic GP regression.

The reference (redmod-team/SympGPR) generates every kernel derivative
symbolically with SymPy and compiles them to Fortran (e.g.
``python/01_pendulum/implicit/init_func.py:20-81`` and the generated
``kernels.f90`` files, 19 scalar functions each).  Here we instead define each
kernel once as a closed-form scalar JAX function of two phase-space points and
obtain the full derivative set (first/second derivatives w.r.t. inputs for the
derivative-observation covariance, and hyperparameter derivatives for the NLL
gradient) with `jax.grad` / `jax.jacfwd`.  The contract is identical; the
mechanism is idiomatic to XLA: the traced derivative expressions fuse into the
covariance build like any other elementwise op.

Kernel variants (reference provenance):

* ``per_se``     — product periodic(q) x squared-exponential(P),
  ``exp(-sin^2((q-q')/2)/(2 lx^2) - (P-P')^2/(2 ly^2))``;
  reference ``python/01_pendulum/implicit/init_func.py:24-29`` /
  ``python/05_tokamak/SympGPR/kernels.f90:1-11``.
* ``se_se``      — product SE x SE (non-periodic, Henon-Heiles),
  reference ``python/03_henon_heiles/init_func.py:24-28``.
* ``sum_per_se`` — sum periodic(q) + SE(P); separable => the mixed block
  d^2k/dq dP' vanishes identically and the map becomes explicit
  (Algorithm 2); reference ``python/01_pendulum/explicit/init_func.py:29``,
  ``python/04_standard_map/kernels_expl_per_q_sq_p.f90:9-11``.
* ``per_se_freq`` — product periodic with *learned* frequency,
  ``exp(-sin^2(freq*(q-q'))/(2 lx^2) - ...)``, one extra hyperparameter;
  reference ``python/01_pendulum/implicit_period_unknown/init_func.py:21-26``.

Conventions: a phase-space point is ``u = (q, P)`` (mixed variables: old
position, new momentum).  ``fn(u, v, params) -> scalar`` must be symmetric and
stationary.  ``params`` is a 1-D array of kernel shape parameters (lengthscales
first); the signal variance ``sig`` is *not* part of ``params`` — it scales the
assembled covariance (matching the reference, where ``hyp[-1]`` multiplies the
built matrix, ``python/01_pendulum/implicit/func.py:44-64``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Kernel:
    """A stationary scalar kernel over 2-D phase-space points.

    Attributes:
      name: registry key.
      n_params: number of shape parameters (lengthscales, frequency, ...).
      fn: ``fn(u, v, params) -> scalar`` with ``u, v`` shape ``(2,)``.
      separable: True when the kernel is a sum k_q(q,q') + k_P(P,P');
        then the mixed derivative block vanishes and the symplectic map
        application is explicit (Algorithm 2 of the paper).
    """

    name: str
    n_params: int
    fn: Callable[[Array, Array, Array], Array]
    separable: bool = False

    # -- derivative set (all via autodiff; replaces the 19 generated Fortran
    #    scalar functions of the reference) --------------------------------

    def grad_u(self, u: Array, v: Array, params: Array) -> Array:
        """(2,) gradient w.r.t. the first point."""
        return jax.grad(self.fn, argnums=0)(u, v, params)

    def hess_uv(self, u: Array, v: Array, params: Array) -> Array:
        """(2,2) matrix H[r,c] = d^2 k / du_r dv_c.

        This is the per-pair block of the derivative-observation covariance
        ("Eq. (38)" in the reference code comments,
        ``python/01_pendulum/implicit/func.py:44-64``).
        """
        return jax.jacfwd(jax.grad(self.fn, argnums=0), argnums=1)(u, v, params)

    def __hash__(self):  # stable hash so Kernel can be a static jit arg
        return hash((self.name, self.n_params, self.separable))

    def __eq__(self, other):
        return (
            isinstance(other, Kernel)
            and self.name == other.name
            and self.n_params == other.n_params
        )


def _per_se(u: Array, v: Array, p: Array) -> Array:
    lx, ly = p[0], p[1]
    dq = u[0] - v[0]
    dP = u[1] - v[1]
    return jnp.exp(
        -jnp.sin(0.5 * dq) ** 2 / (2.0 * lx**2) - dP**2 / (2.0 * ly**2)
    )


def _se_se(u: Array, v: Array, p: Array) -> Array:
    lx, ly = p[0], p[1]
    dq = u[0] - v[0]
    dP = u[1] - v[1]
    return jnp.exp(-dq**2 / (2.0 * lx**2) - dP**2 / (2.0 * ly**2))


def _sum_per_se(u: Array, v: Array, p: Array) -> Array:
    lx, ly = p[0], p[1]
    dq = u[0] - v[0]
    dP = u[1] - v[1]
    return jnp.exp(-jnp.sin(0.5 * dq) ** 2 / (2.0 * lx**2)) + jnp.exp(
        -dP**2 / (2.0 * ly**2)
    )


def _per_se_freq(u: Array, v: Array, p: Array) -> Array:
    lx, ly, freq = p[0], p[1], p[2]
    dq = u[0] - v[0]
    dP = u[1] - v[1]
    return jnp.exp(
        -jnp.sin(freq * dq) ** 2 / (2.0 * lx**2) - dP**2 / (2.0 * ly**2)
    )


PER_SE = Kernel("per_se", 2, _per_se)
SE_SE = Kernel("se_se", 2, _se_se)
SUM_PER_SE = Kernel("sum_per_se", 2, _sum_per_se, separable=True)
PER_SE_FREQ = Kernel("per_se_freq", 3, _per_se_freq)

KERNELS: dict[str, Kernel] = {
    k.name: k for k in (PER_SE, SE_SE, SUM_PER_SE, PER_SE_FREQ)
}


def get_kernel(name: str) -> Kernel:
    try:
        return KERNELS[name]
    except KeyError:
        raise KeyError(
            f"unknown kernel {name!r}; available: {sorted(KERNELS)}"
        ) from None
