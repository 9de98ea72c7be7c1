"""Profiling / capacity reporting.

Replaces count_param.py (fvcore FLOPs + param table) with XLA's own
compiled cost analysis, and the reference's wall-clock FPS loops
(predict.py:253-333) with a block_until_ready timing harness; exposes
jax.profiler traces for deep dives (SURVEY.md section 5 tracing plan).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def flops_of(fn: Callable, *args) -> Optional[float]:
    """FLOPs from the compiled executable's cost analysis
    (the TPU-native fvcore replacement — SURVEY.md section 2.4)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return float(cost.get("flops", float("nan")))


def benchmark(
    fn: Callable,
    *args,
    iters: int = 50,
    warmup: int = 5,
) -> Dict[str, float]:
    """Mean/median wall time of a jitted callable (seconds/iteration)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "median_s": float(np.median(arr)),
        "p90_s": float(np.percentile(arr, 90)),
        "best_s": float(arr.min()),
    }


def chained_benchmark(
    step_fn: Callable,
    images: "jnp.ndarray",
    iters: int = 20,
    warmup: bool = True,
) -> Dict[str, float]:
    """Throughput measurement that is honest under asynchronous dispatch.

    Some backends (e.g. the remote-tunneled TPU used here) complete
    `block_until_ready` before the work has actually executed, so the
    classic dispatch-loop benchmark reports fantasy numbers, while a
    fetch-per-iteration loop pays a full host round-trip (~30 ms) per
    step. Instead we chain `iters` executions inside ONE jitted
    lax.fori_loop with a value dependency between steps, fetch a scalar
    once, and divide. The result is pure device time + a single RTT.

    step_fn(images) must return a pytree of arrays whose first element
    depends on the full computation. `images` may be a single array or
    a PYTREE of inputs — every leaf is threaded through the loop carry
    (`x + acc*0`), so no input embeds as a constant and no part of the
    body is loop-invariant (hoistable). Pass EVERYTHING the step
    consumes here: a closed-over array becomes a compile-time constant,
    and any computation on it gets hoisted out of the timed loop
    (the fantasy-timing traps documented in CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(imgs, n):
        def body(_, carry):
            imgs_c, acc = carry
            out = step_fn(imgs_c)
            leaves = jax.tree_util.tree_leaves(out)
            acc = acc + sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            imgs_c = jax.tree_util.tree_map(
                lambda x: x + (acc * 0).astype(x.dtype), imgs_c
            )
            return imgs_c, acc

        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0)))[1]

    if warmup:
        np.asarray(chained(images, 1))  # compile + run once
    t0 = time.perf_counter()
    np.asarray(chained(images, iters))
    dt = time.perf_counter() - t0
    return {"total_s": dt, "per_iter_s": dt / iters}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
