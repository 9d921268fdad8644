"""Multi-host initialization and mesh topology helpers.

Single-host multi-chip needs nothing special (``jax.devices()`` sees the
slice over ICI).  Across hosts, ``initialize()`` wraps
``jax.distributed.initialize`` so every process sees the global device set;
meshes built from ``jax.devices()`` then span hosts, with XLA routing
collectives over ICI within a slice and DCN between slices.

Axis placement guidance for this framework (see SURVEY.md §2.5):
* ``kp`` (covariance build) and any distributed-Cholesky axis want the
  *fastest* interconnect — keep them within a slice (ICI).
* restart/chain parallelism (CMA-ES populations, HMC chains, L-BFGS
  restarts) is embarrassingly parallel — put it on the DCN axis.
* ``dp`` (orbit batches) has no cross-orbit communication at all.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (no-op when single-process).

    With no arguments, relies on the environment (TPU pod runtime or
    JAX_COORDINATOR_ADDRESS etc.); arguments override for manual setups.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def hybrid_mesh(
    ici_axis: str = "kp", dcn_axis: str = "chains"
) -> Mesh:
    """2-D mesh with hosts on the DCN axis and per-host devices on the ICI
    axis — the layout the embarrassingly-parallel search axes want."""
    n_proc = jax.process_count()
    local = jax.local_device_count()
    devices = np.asarray(jax.devices()).reshape(n_proc, local)
    return Mesh(devices, (dcn_axis, ici_axis))
