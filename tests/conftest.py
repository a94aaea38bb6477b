"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host-platform virtual devices
(SURVEY.md section 4: the fake-cluster substitute); the real-TPU bench path
lives in bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The env var alone is not honored when the axon TPU plugin is present;
# the config override is authoritative.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compile time dominates test wall time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
