"""Persistent XLA compilation cache.

First compiles through the remote-TPU tunnel cost 1-7 minutes per
(model, shape); the persistent cache makes every later process start
warm (ROADMAP round-1 item #10). Call enable() before the first jit —
every CLI entry point does. jax keys cache entries by HLO+flags+backend
hash, so stale hits are not a correctness concern — EXCEPT the host
microarchitecture: XLA:CPU persists AOT machine code specialized to the
compiling host's CPU features, and loading it on a different host can
SIGILL (observed: a cached avx512 artifact crashing the test suite on a
non-avx512 box). The cache directory is therefore keyed by a hash of
/proc/cpuinfo flags so each host microarchitecture gets its own cache.
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_DIR = os.path.expanduser("~/.cache/jabd_tpu_xla")


def _host_key() -> str:
    """Short stable key for this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable(cache_dir: str | None = None, allow_cpu: bool = False) -> str:
    """Idempotently enable the persistent compilation cache.

    On the CPU backend the cache stores host-specialized AOT machine
    code; a genuine cross-host load can SIGILL, hence the cpuinfo
    keying. Note the `cpu_aot_loader.cc` "machine feature mismatch"
    ERROR lines are NOT evidence of a foreign artifact: XLA stamps
    tuning preferences (+prefer-no-gather/+prefer-no-scatter) into the
    compile-time feature list but never into its host detection, so the
    loader prints them on EVERY cache hit — verified by storing and
    reloading on the same machine seconds apart (6 such lines, correct
    execution). CPU compiles are also fast. So the cache is a no-op on
    CPU unless the caller opts in (the test conftest does —
    single-host, and the ~35-min suite recompiles many medium graphs
    otherwise)."""
    import jax

    if jax.default_backend() == "cpu" and not allow_cpu:
        return ""
    path = (
        cache_dir
        or os.environ.get("JABD_COMPILE_CACHE")
        or DEFAULT_DIR
    )
    path = os.path.join(path, _host_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took noticeable compile time (default only
    # caches compilations >1s; the suite has many medium graphs).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
