"""Persistent XLA compilation cache setup (shared by all entry points)."""

import os


def enable_compilation_cache() -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
