"""Test environment: 8 virtual CPU devices so sharding tests run anywhere.

The axon TPU plugin's sitecustomize imports jax at interpreter start and
calls jax.config.update("jax_platforms", "axon,cpu"), which overrides the
JAX_PLATFORMS env var — so we must update the config *after* import (the
backends are not initialized yet at conftest time, so this still works).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the big SPMD train-step tests take minutes
# to compile cold on this one-core host; cache them across runs like every
# other entry point does.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
