"""Enable the persistent JAX compilation cache (compiles on the tunneled TPU
compile service are expensive; cache hits make process restarts cheap)."""

import jax


def enable_persistent_cache(path: str = "/root/.cache/jax_compile") -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
