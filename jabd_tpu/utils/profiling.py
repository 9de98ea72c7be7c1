"""Profiling / capacity reporting.

Replaces count_param.py (fvcore FLOPs + param table) with XLA's own
compiled cost analysis, and the reference's wall-clock FPS loops
(predict.py:253-333) with a block_until_ready timing harness; exposes
jax.profiler traces for deep dives (SURVEY.md section 5 tracing plan).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional, Tuple

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


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
