"""Fitted-model containers (pytrees) and the model artifact format.

The reference keeps all trained state (hyp, Kyinv, xtrain, ztrain) as loose
arrays in process memory and has no serialization at all (SURVEY.md section 5.4).
Here a fitted model is an immutable pytree that can be passed straight into
jitted map-application code, and can be saved/loaded as a single ``.npz``
artifact (hyperparameters, Cholesky factor, alpha, training set,
normalization constants).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sympgpr_tpu.gp.covariance import build_K, build_Kreg
from sympgpr_tpu.gp.likelihood import chol_and_alpha
from sympgpr_tpu.kernels.variants import Kernel, get_kernel

Array = jax.Array


class SympGP(struct.PyTreeNode):
    """Fitted symplectic (derivative-observation) GP over mixed variables.

    X: (N, 2) training points (q, P); z: (2N,) targets (p - P | Q - q);
    alpha = (K + sig2n I)^{-1} z, precomputed (hoists the per-Newton-iteration
    ``matmul(Kyinv, ztrain)`` of the reference, ``sympgpr.f90:121``);
    L: lower Cholesky factor of K + sig2n I (for posterior variance).
    """

    kernel: Kernel = struct.field(pytree_node=False)
    params: Array
    sig: Array
    sig2n: Array
    X: Array
    z: Array
    alpha: Array
    L: Array

    @property
    def n_train(self) -> int:
        return self.X.shape[0]

    @classmethod
    def create(
        cls,
        kernel: Kernel,
        params: Array,
        sig: Array,
        sig2n: Array,
        X: Array,
        z: Array,
    ) -> "SympGP":
        params = jnp.asarray(params)
        sig = jnp.asarray(sig)
        sig2n = jnp.asarray(sig2n)
        X = jnp.asarray(X)
        z = jnp.asarray(z)
        K = build_K(kernel, X, X, params, sig)
        Ky = K + sig2n * jnp.eye(K.shape[0], dtype=K.dtype)
        L, alpha = chol_and_alpha(Ky, z)
        return cls(
            kernel=kernel, params=params, sig=sig, sig2n=sig2n, X=X, z=z,
            alpha=alpha, L=L,
        )

    @classmethod
    def from_alpha(
        cls,
        kernel: Kernel,
        params: Array,
        sig: Array,
        sig2n: Array,
        X: Array,
        z: Array,
        alpha: Array,
        L: Array | None = None,
    ) -> "SympGP":
        """Model from an externally solved alpha (distributed training).

        The large-N path (``distributed/large.py::fit_large``) never
        materializes the replicated (2N, 2N) covariance, so there is no
        dense Cholesky factor to store; L defaults to an empty (0, 0)
        placeholder.  Everything map application needs (alpha, X,
        hyperparameters) is present; posterior *variance* requires L —
        recreate via ``SympGP.create`` if needed at a size that fits one
        device.
        """
        if L is None:
            L = jnp.zeros((0, 0), jnp.asarray(alpha).dtype)
        return cls(
            kernel=kernel, params=jnp.asarray(params), sig=jnp.asarray(sig),
            sig2n=jnp.asarray(sig2n), X=jnp.asarray(X), z=jnp.asarray(z),
            alpha=jnp.asarray(alpha), L=jnp.asarray(L),
        )

    def training_error(self) -> Array:
        """MSE(z, K alpha) — the diagnostic printed by the reference
        (``python/05_tokamak/SympGPR/main.py:80-83``)."""
        K = build_K(self.kernel, self.X, self.X, self.params, self.sig)
        return jnp.mean((K @ self.alpha - self.z) ** 2)

    def for_deployment(self, rel_jitter: float = 1e-3) -> "SympGP":
        """Re-solve alpha/L at a larger jitter for float32 execution.

        Smooth-kernel GP interpolation at tiny jitter produces |alpha| ~ 1e3+
        whose posterior sums cancel heavily; in float32 that cancellation
        amplifies round-off ~1e3x and (measured on the tokamak workload)
        degrades rollout energy statistics ~12x.  Re-solving with
        ``sig2n = rel_jitter * max(diag K)`` trades a bounded interpolation
        bias for |alpha| ~ O(1): at rel_jitter ~ 1e-3 the f32 rollout matches
        the f64 one within Monte-Carlo error (see docs/DESIGN.md section 4).
        Hyperparameters are untouched.
        """
        K = build_K(self.kernel, self.X, self.X, self.params, self.sig)
        sig2n = rel_jitter * jnp.max(jnp.diagonal(K))
        Ky = K + sig2n * jnp.eye(K.shape[0], dtype=K.dtype)
        L, alpha = chol_and_alpha(Ky, self.z)
        return self.replace(sig2n=sig2n, alpha=alpha, L=L)


class AuxGP(struct.PyTreeNode):
    """Auxiliary ordinary GP used for the Newton initial guess.

    X: (N, 2) points (q, p); z: (N,) targets.  ``delta`` is True when the
    target is P - p (tokamak/standard-map/Henon style,
    ``python/05_tokamak/SympGPR/main.py:35``) and False when it is absolute P
    (pendulum style, ``python/01_pendulum/implicit/main.py:125``); the guess
    for P is then p + mean (resp. mean).  The reference feeds E[P-p] directly
    to the root-finder as the P guess (``sympgpr.f90:103``) — a quirk that
    only costs Newton iterations; we use the consistent guess.
    """

    kernel: Kernel = struct.field(pytree_node=False)
    delta: bool = struct.field(pytree_node=False)
    params: Array
    sig: Array
    sig2n: Array
    X: Array
    z: Array
    alpha: Array
    L: Array

    def for_deployment(self, rel_jitter: float = 1e-3) -> "AuxGP":
        """f32-friendly re-solve; see ``SympGP.for_deployment``."""
        K = build_Kreg(self.kernel, self.X, self.X, self.params, self.sig)
        sig2n = rel_jitter * jnp.max(jnp.diagonal(K))
        Ky = K + sig2n * jnp.eye(K.shape[0], dtype=K.dtype)
        L, alpha = chol_and_alpha(Ky, self.z)
        return self.replace(sig2n=sig2n, alpha=alpha, L=L)

    @classmethod
    def create(
        cls,
        kernel: Kernel,
        params: Array,
        sig: Array,
        sig2n: Array,
        X: Array,
        z: Array,
        delta: bool = True,
    ) -> "AuxGP":
        params = jnp.asarray(params)
        sig = jnp.asarray(sig)
        sig2n = jnp.asarray(sig2n)
        X = jnp.asarray(X)
        z = jnp.asarray(z)
        K = build_Kreg(kernel, X, X, params, sig)
        Ky = K + sig2n * jnp.eye(K.shape[0], dtype=K.dtype)
        L, alpha = chol_and_alpha(Ky, z)
        return cls(
            kernel=kernel, delta=delta, params=params, sig=sig, sig2n=sig2n,
            X=X, z=z, alpha=alpha, L=L,
        )


# ---------------------------------------------------------------------------
# Artifact format


_ARRAY_FIELDS = ("params", "sig", "sig2n", "X", "z", "alpha", "L")


def _to_dict(model: SympGP | AuxGP, prefix: str) -> dict[str, Any]:
    out = {f"{prefix}kernel": np.asarray(model.kernel.name)}
    if isinstance(model, AuxGP):
        out[f"{prefix}delta"] = np.asarray(model.delta)
    for f in _ARRAY_FIELDS:
        out[f"{prefix}{f}"] = np.asarray(getattr(model, f))
    return out


def save_models(path: str, sympgp: SympGP, aux: AuxGP | None = None,
                **extra: Any) -> None:
    """Save fitted models (and optional extra arrays) to a single .npz."""
    d = _to_dict(sympgp, "sympgp.")
    if aux is not None:
        d.update(_to_dict(aux, "aux."))
    for k, v in extra.items():
        d[f"extra.{k}"] = np.asarray(v)
    np.savez(path, **d)


def load_models(path: str) -> tuple[SympGP, AuxGP | None, dict[str, Any]]:
    d = dict(np.load(path, allow_pickle=False))

    def fields(prefix):
        return {f: jnp.asarray(d[f"{prefix}{f}"]) for f in _ARRAY_FIELDS}

    sympgp = SympGP(kernel=get_kernel(str(d["sympgp.kernel"])),
                    **fields("sympgp."))
    aux = None
    if "aux.kernel" in d:
        aux = AuxGP(kernel=get_kernel(str(d["aux.kernel"])),
                    delta=bool(d["aux.delta"]), **fields("aux."))
    extra = {k[len("extra."):]: d[k] for k in d if k.startswith("extra.")}
    return sympgp, aux, extra
