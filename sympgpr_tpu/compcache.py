"""Persistent XLA compilation cache setup.

Every bench run and CLI workload invocation used to re-pay full XLA
compilation through the tunneled backend — ~540 s of the 559 s round-4
bench total was compile (BENCH_r04 stage lines).  The persistent cache
stores serialized executables keyed on (HLO, jaxlib, backend, flags);
warm processes load instead of recompiling.  Verified live on the v5e
axon backend (round 5): a 154 s compile drops to a 21-48 s cached load
(the residual is executable deserialization + tunnel dispatch, with
high tunnel variance).

Opt out with ``SYMPGPR_COMPILE_CACHE=off``; point elsewhere with
``SYMPGPR_COMPILE_CACHE=/path``.  The default lives inside the repo
(``.jax_cache/``, gitignored) so driver bench runs and interactive runs
share entries.

Measured effect on the full bench (round 5, v5e): per-stage compile
fields drop ~10x warm (adam_compile_s 41.5 -> 5.3, nll stage 29 -> 5.1,
rollout_compile_s 6.9 -> 2.3) while total_bench_s only falls 522 ->
452 s — the residual is per-program cached-executable LOAD + dispatch
latency through the tunnel (~5 s x ~30 distinct programs), not
recompilation.  On directly-attached hardware the warm total would
approach the pure-compute sum (~30 s).

The reference has no compilation at all (Fortran is compiled once by
make, ``python/05_tokamak/SympGPR/Makefile``); this is the TPU-native
equivalent of not rebuilding the .so per run.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache.

    Call BEFORE the first jit compilation (import time of drivers).
    Returns the cache dir, or None when disabled.
    """
    env = os.environ.get("SYMPGPR_COMPILE_CACHE")
    if env is not None and env.lower() in ("off", "0", "none", ""):
        return None
    cache = path or env or _DEFAULT
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    # everything slower than 1 s is worth persisting through the tunnel
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # keep only the jit-executable cache (no XLA-internal side caches).
    # Known benign noise: loading cached XLA:CPU executables logs a
    # cpu_aot_loader feature-mismatch error for the +prefer-no-scatter /
    # +prefer-no-gather PSEUDO-features (XLA compile preferences, not
    # host ISA bits) — the load proceeds and results are correct (full
    # suite + bench green with warm cache).
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return cache
