import os

# Virtual 8-device CPU mesh for sharding tests.  The flag must be in place
# before the CPU backend initializes (jax itself may already be imported by
# the environment's sitecustomize — that's fine, backends are lazy).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Route to CPU even when a TPU plugin pre-registered itself via env
# (JAX_PLATFORMS may be pinned to a tunneled TPU; config.update wins).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
