"""Persistent XLA compilation cache.

First compiles through the remote-TPU tunnel cost 1-7 minutes per
(model, shape); the persistent cache makes every later process start
warm (ROADMAP round-1 item #10). Call enable() before the first jit —
every CLI entry point does. jax keys cache entries by HLO+flags+backend
hash, so stale hits are not a correctness concern.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/jabd_tpu_xla")


def enable(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache."""
    import jax

    path = (
        cache_dir
        or os.environ.get("JABD_COMPILE_CACHE")
        or DEFAULT_DIR
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took noticeable compile time (default only
    # caches compilations >1s; the suite has many medium graphs).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
