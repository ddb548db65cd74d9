"""Test config: force an 8-device CPU platform so sharding tests exercise a
virtual mesh without TPU hardware.

The environment's sitecustomize initializes the axon TPU backend at
interpreter start, so env vars alone don't work: the platform must be
switched via jax.config + a backend reset.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax._src.xla_bridge._clear_backends()
assert jax.default_backend() == "cpu", jax.default_backend()

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: amortizes XLA-CPU compiles across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
