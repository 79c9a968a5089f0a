"""Persistent XLA compilation cache.

SDXL program compiles are expensive (the 31-step scanned UNet takes minutes
over the axon tunnel); caching compiled executables on disk makes every run
after the first start in seconds. Call init_compilation_cache() before the
first jit — the CLI and bench entry points do.
"""

from __future__ import annotations

import os


def init_compilation_cache(path: str | None = None) -> None:
    import jax

    path = (
        path
        or os.environ.get("SDXL_TPU_XLA_CACHE")
        or os.path.expanduser("~/.cache/sdxl_tpu_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
