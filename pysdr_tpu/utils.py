"""Small host-side helpers shared by the app, bench, and driver entries."""

from __future__ import annotations

import os

# Repo-local so it survives across runs without touching anything outside
# the tree (driver rounds re-enter the same checkout).
DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def prepay_transfer_tax(background: bool = True):
    """Warm the device->host transfer path as early as possible.

    On the axon-tunneled TPU backend the FIRST device->host pull of a
    process stalls for minutes (measured 280-780 s this round) while the
    proxy sets up its reverse data path; every later pull is ~25 ms. Any
    app/bench process that will read audio/PSD back should fire this at
    startup so the stall overlaps compilation and the first block
    uploads instead of landing inside the streaming loop. No-op on CPU.

    Returns the Thread (background=True) or the elapsed seconds.
    """
    def _pull():
        import time
        import numpy as np
        import jax
        import jax.numpy as jnp
        t0 = time.monotonic()
        try:
            np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,),
                                                          jnp.float32)))
        except Exception:
            return None
        return time.monotonic() - t0

    if not background:
        return _pull()
    import threading
    t = threading.Thread(target=_pull, daemon=True,
                         name="prepay-transfer-tax")
    t.start()
    return t


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
