"""Host/accelerator device placement helpers.

The reference runs everything on the host CPU in float64.  Here the split
is explicit: small-N float64 work (data generation, N<=O(100) fits — the
reference scale, ``python/05_tokamak/SympGPR/main.py:40-78``) belongs on
the host, while rollouts and large-N sharded builds run on the
accelerator.  TPU float64 is software-emulated and an order of magnitude
slower than host BLAS at these sizes, so pinning the fit to the host cuts
on-TPU workload wall-time from ~100 s to ~5 s without touching results.
"""

from __future__ import annotations

from contextlib import nullcontext

import jax
import jax.tree_util as jtu


def ensure_cpu_backend() -> None:
    """Make a CPU backend available alongside an accelerator plugin.

    Under a pinned accelerator platform (e.g. ``JAX_PLATFORMS=axon``) JAX
    initializes only that backend; appending ``cpu`` keeps the default
    device unchanged while making ``jax.devices('cpu')`` work.  Must run
    before backends are initialized to take effect.
    """
    import os

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")


def host_device():
    """The CPU device, or None if no CPU backend is available."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def host_fit():
    """Context manager placing f64 data-gen/training on the host CPU.

    No-op when the default backend already is the CPU.  Arrays created
    inside are committed to the host — move anything the accelerator
    rollout needs with :func:`to_default_device`.
    """
    if jax.default_backend() == "cpu":
        return nullcontext()
    cpu = host_device()
    return jax.default_device(cpu) if cpu is not None else nullcontext()


def to_default_device(tree):
    """Re-place a pytree of (possibly host-committed) arrays on the default
    device, uncommitted, so downstream ops run where the user pointed JAX."""
    dev = jax.devices()[0]
    return jtu.tree_map(lambda a: jax.device_put(a, dev), tree)
