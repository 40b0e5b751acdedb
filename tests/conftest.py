"""Test configuration: force an 8-device virtual CPU mesh so sharding tests run anywhere.

Must set XLA flags before jax initializes; keep this file import-light.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the config update
# works. Tests must run on (virtual 8-device) CPU - the tunnel makes per-op dispatch ~10ms.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
