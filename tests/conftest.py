"""Test harness: run everything on an 8-device virtual CPU mesh, x64 on.

TPU in this environment is a single tunneled chip (platform 'axon') whose
plugin overrides the JAX_PLATFORMS env var, so the platform must be forced
through jax.config *after* import.  Sharding tests use the virtual CPU
devices (same XLA SPMD partitioner as real meshes).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
