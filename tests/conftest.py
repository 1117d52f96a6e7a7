"""Test config: force an 8-device virtual CPU platform so sharding tests run
anywhere, and keep numerics deterministic."""
import os

# The harness presets JAX_PLATFORMS=axon (tunneled TPU); tests must run on the
# virtual CPU platform, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
