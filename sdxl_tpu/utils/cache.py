"""Persistent XLA compilation cache.

SDXL program compiles are expensive (the 31-step scanned UNet takes minutes
over the axon tunnel); caching compiled executables on disk makes every run
after the first start in seconds. Call init_compilation_cache() before the
first jit — the CLI and bench entry points do.
"""

from __future__ import annotations

import os


def _host_fingerprint() -> str:
    """Hash of the host CPU's feature set. XLA:CPU caches AOT executables
    compiled for the COMPILING machine's features; loading one on a host
    with fewer features SIGILLs/segfaults (observed: a cache carried
    across machines crashed the test suite in get_executable_and_time).
    Keying the cache dir by the feature set makes a different host start
    a fresh cache instead of deserializing incompatible code."""
    import hashlib
    import platform

    desc = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    desc += " " + " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    return hashlib.sha1(desc.encode()).hexdigest()[:12]


def init_compilation_cache(path: str | None = None) -> None:
    import jax

    if jax.default_backend() == "cpu" and not os.environ.get(
            "SDXL_TPU_XLA_CACHE_CPU"):
        # The cache exists for the minutes-long TPU-tunnel compiles; CPU
        # compiles are cheap, and XLA:CPU AOT (de)serialization is host-
        # feature-sensitive — on this box it SIGSEGVs both reading a
        # carried cache AND writing fresh entries (observed in
        # get_executable_and_time and put_executable_and_time). Opt back
        # in with SDXL_TPU_XLA_CACHE_CPU=1 on a trusted host.
        return
    path = (
        path
        or os.environ.get("SDXL_TPU_XLA_CACHE")
        or os.path.expanduser("~/.cache/sdxl_tpu_xla")
    )
    path = os.path.join(path, _host_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
