"""Depthwise-conv-on-MXU microbenchmark.

Hypothesis (BENCH_NOTES round-1 lever #1): depthwise taps are VPU-bound
(~0.5 TFLOP/s effective). Reformulating a depthwise conv as a
block-grouped conv (feature_group_count = C/B with a block-diagonal
kernel, B~128 = one MXU tile) computes the same result with B x the
FLOPs — but on the MXU at ~200 TFLOP/s. Break-even is B ~ 400 at peak;
at B~128 the MXU form should win 2-3x IF the dw op is truly
compute-bound and the MXU achieves decent utilization on 3x3 convs.

Measures ALL of MNV3-Large's depthwise taps chained inside ONE jitted
fori_loop per variant (2 tunnel compiles total, not 30).

Usage: python scripts/bench_dw_mxu.py [batch] [size] [block]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def dw_shapes_flagship(size=640):
    """(H, W, C, k, stride) of every depthwise tap in MNV3-Large."""
    blocks = [
        (3, 16, 1), (3, 64, 2), (3, 72, 1), (5, 72, 2), (5, 120, 1),
        (5, 120, 1), (3, 240, 2), (3, 200, 1), (3, 184, 1), (3, 184, 1),
        (3, 480, 1), (3, 672, 1), (5, 672, 2), (5, 672, 1), (5, 960, 1),
    ]
    g = size // 2
    shapes = []
    for k, c, st in blocks:
        shapes.append((g, g, c, k, st))
        if st == 2:
            g = (g + 1) // 2
    return shapes


def build_cases(batch, size, block, rng):
    """Per tap: (x, dw_kernel, blk_kernel, stride, pad, groups)."""
    cases = []
    for h, w, c, k, st in dw_shapes_flagship(size):
        x = jnp.asarray(
            rng.normal(0, 1, (batch, h, w, c)).astype(np.float32),
            jnp.bfloat16,
        )
        kd_np = rng.normal(0, 0.1, (k, k, 1, c)).astype(np.float32)
        kd = jnp.asarray(kd_np, jnp.bfloat16)
        groups = min(
            (g for g in range(1, c + 1) if c % g == 0),
            key=lambda g: abs(c / g - min(block, c)),
        )
        b = c // groups
        kb = np.zeros((k, k, b, c), np.float32)
        for ch in range(c):
            kb[:, :, ch % b, ch] = kd_np[:, :, 0, ch]
        kb = jnp.asarray(kb, jnp.bfloat16)
        pad = [(k // 2, k // 2)] * 2
        cases.append((x, kd, kb, st, pad, groups, c, b, f"{h}x{c}k{k}s{st}"))
    return cases


def bench_variant(cases, which, iters=10):
    """One jitted chained loop running every tap once per iteration."""

    @jax.jit
    def chained(n):
        def body(_, acc):
            s = acc
            for x, kd, kb, st, pad, groups, c, b, _name in cases:
                xc = x + (s * 0).astype(x.dtype)  # serialize iterations
                if which == "dw":
                    y = lax.conv_general_dilated(
                        xc, kd, (st, st), pad, dimension_numbers=DIMS,
                        feature_group_count=c,
                    )
                else:
                    y = lax.conv_general_dilated(
                        xc, kb, (st, st), pad, dimension_numbers=DIMS,
                        feature_group_count=groups,
                    )
                s = s + jnp.sum(y).astype(jnp.float32)
            return s

        return lax.fori_loop(0, n, body, jnp.float32(0))

    float(np.asarray(chained(1)))
    t0 = time.perf_counter()
    float(np.asarray(chained(iters)))
    return (time.perf_counter() - t0) / iters


def main(batch=32, size=640, block=128):
    rng = np.random.default_rng(0)
    cases = build_cases(batch, size, block, rng)
    t_dw = bench_variant(cases, "dw")
    print(json.dumps({"total_dw_ms": round(t_dw * 1e3, 2)}), flush=True)
    t_blk = bench_variant(cases, "blk")
    print(
        json.dumps(
            {
                "total_blk_ms": round(t_blk * 1e3, 2),
                "overall_speedup": round(t_dw / t_blk, 2),
                "batch": batch,
                "block": block,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
