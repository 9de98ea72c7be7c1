"""Profiling / capacity reporting.

Replaces count_param.py (fvcore FLOPs + param table) with XLA's own
compiled cost analysis, and the reference's wall-clock FPS loops
(predict.py:253-333) with a block_until_ready timing harness; exposes
jax.profiler traces for deep dives (SURVEY.md section 5 tracing plan).
"""

from __future__ import annotations

import contextlib
import os
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


def per_layer_table(
    model: Any,
    x: "jnp.ndarray",
    total_params: Optional[int] = None,
    total_flops: Optional[float] = None,
) -> list:
    """Per-module params + FLOPs rows (VERDICT r4 #7 — the role of
    fvcore's `flop_count_table`, count_param.py:388-395: the per-block
    evidence behind the paper's "lightweight" claim).

    Walks the model one module level deep via flax's summary table
    (each submodule's FLOPs from XLA cost analysis of that module's
    __call__ alone) and appends an "(other)" row holding the glue —
    top-level ops like FPN-sum adds, resize matmuls, head concats —
    so the rows SUM to the aggregate `cli count` reports. Falls back
    to a params-only table if the flax summary internals move.

    Only valid on the CPU backend: flax computes per-module FLOPs from
    the UNCOMPILED lowering's cost analysis, which remote TPU backends
    don't populate (every row silently reads 0.0). Callers on another
    backend should use per_layer_table_subprocess.
    """
    import flax.linen.summary as S

    rows = []
    try:
        table = S._get_module_table(
            model,
            depth=1,
            show_repeated=False,
            compute_flops=True,
            compute_vjp_flops=False,
        )(jax.random.PRNGKey(0), x, train=False)
    except Exception:  # pragma: no cover - private-API drift guard
        table = None
    if table is not None:
        for row in table:
            if not row.path:  # root row = aggregate, handled below
                continue
            if len(row.path) != 1:
                continue
            nparams = sum(
                int(np.prod(v.shape))
                for v in jax.tree_util.tree_leaves(
                    row.counted_variables.get("params", {})
                )
            )
            flops = float(row.flops) if row.flops is not None else 0.0
            rows.append(
                {
                    "module": row.path[0],
                    "params": nparams,
                    "gflops": round(flops / 1e9, 4),
                }
            )
    if total_params is not None or total_flops is not None:
        p_sum = sum(r["params"] for r in rows)
        f_sum = sum(r["gflops"] for r in rows)
        rows.append(
            {
                "module": "(other)",
                "params": max(0, (total_params or p_sum) - p_sum),
                "gflops": round(
                    max(0.0, (total_flops or 0.0) / 1e9 - f_sum), 4
                ),
            }
        )
        rows.append(
            {
                "module": "TOTAL",
                "params": total_params or p_sum,
                "gflops": round((total_flops or f_sum * 1e9) / 1e9, 4),
            }
        )
    return rows


def per_layer_table_subprocess(
    preset: str,
    size: int,
    total_params: Optional[int] = None,
    total_flops: Optional[float] = None,
) -> list:
    """per_layer_table computed in a CPU-forced child process.

    The per-module FLOPs come from flax's uncompiled-lowering cost
    analysis, which only the CPU backend populates — under the axon
    tunnel every module row reads 0.0. Logical FLOPs are backend-
    independent, so a CPU child gives the right table for any backend
    (and lowering without compiling is fast even for ResNet-152)."""
    import json as _json
    import math
    import subprocess
    import sys

    # repr() of a non-finite float would emit the bare names `nan`/`inf`
    # into the child source (NameError) — and flops_of's documented
    # no-data fallback IS nan on remote backends. Non-finite == unknown.
    if total_flops is not None and not math.isfinite(total_flops):
        total_flops = None

    code = (
        "import os, json\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from jabd_tpu import configs\n"
        "from jabd_tpu.models import build_model\n"
        "from jabd_tpu.utils.profiling import per_layer_table\n"
        f"mcfg = configs.get_model_config({preset!r})\n"
        "model = build_model(mcfg, mode='eval')\n"
        f"x = jnp.zeros((1, {size}, {size}, 3), jnp.float32)\n"
        f"rows = per_layer_table(model, x, total_params={total_params!r},"
        f" total_flops={total_flops!r})\n"
        "print(json.dumps(rows))\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
    )
    if out.returncode != 0:
        # check=True would swallow the child's traceback; surface it.
        raise RuntimeError(
            f"per-layer child failed (rc={out.returncode}): "
            + out.stderr.strip()[-500:]
        )
    return _json.loads(out.stdout.strip().splitlines()[-1])


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
