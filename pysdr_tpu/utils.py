"""Small host-side helpers shared by the app, bench, and driver entries."""

from __future__ import annotations

import os

# Repo-local so it survives across runs without touching anything outside
# the tree (driver rounds re-enter the same checkout).
DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Opt-in JAX persistent compilation cache (PYSDR_TPU_CACHE=<dir>).

    OFF by default: on the axon-tunneled TPU backend, runs with the cache
    enabled hang for minutes on executable serialization/deserialization
    (measured 28 s cache-off vs >400 s cache-on for the same config), so
    it must never be on implicitly there. On CPU or a normal TPU runtime
    set PYSDR_TPU_CACHE to a directory to amortize compiles across runs.
    """
    import jax

    path = path or os.environ.get("PYSDR_TPU_CACHE")
    if not path or path == "off":
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return path
    except Exception:
        return None
