"""Test config: force an 8-device CPU platform so sharding tests exercise a
virtual mesh without TPU hardware, per the multi-chip dry-run contract."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the env's axon TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: amortizes XLA-CPU compiles across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
