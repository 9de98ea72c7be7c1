"""Per-layer depthwise forward probe at the HEADLINE inference shape.

Round-4 question: the flagship 640^2 forward runs at ~9% MFU and the
round-2 closure blamed a ~0.5 TFLOP/s VPU ceiling on depthwise convs.
Is that ceiling uniform, or do the small-channel layers (C=16..120,
which fill <128/128 VPU lanes in NHWC) run far below the large-channel
ones? If small-C layers are lane-starved, a Pallas kernel with spatial
on lanes is a candidate; if the ceiling is uniform, the closure stands.

Prints per-layer fwd ms, GFLOP, achieved GFLOP/s, and the summed dw
share so the decision is measured, not guessed.

Usage: python scripts/bench_dw_inference.py [batch] [size] [iters]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# Flagship depthwise layer shapes at `size` input: (spatial_divisor,
# channels, kernel, stride): spatial = size // divisor (stem is s2, then
# the strides below accumulate).
DW_SHAPES = [
    (2, 16, 3, 1),
    (2, 64, 3, 2),
    (4, 72, 3, 1),
    (4, 72, 5, 2),
    (8, 120, 5, 1),
    (8, 120, 5, 1),
    (8, 240, 3, 2),
    (16, 200, 3, 1),
    (16, 184, 3, 1),
    (16, 184, 3, 1),
    (16, 480, 3, 1),
    (16, 672, 3, 1),
    (16, 672, 5, 2),
    (32, 960, 5, 1),
    (32, 960, 5, 1),
]


def main(batch: int, size: int, iters: int) -> None:
    rows = []
    total_ms = 0.0
    total_gflop = 0.0
    for div, ch, k, stride in DW_SHAPES:
        spatial = size // div
        # Inputs are generated ON DEVICE: host arrays of this size take
        # minutes through the ~55 MB/s tunnel (the c64@320 input alone
        # is 1.7 GB at bs=128).
        key = jax.random.PRNGKey(0)
        x = jax.jit(
            lambda kk: jax.random.normal(
                kk, (batch, spatial, spatial, ch), jnp.bfloat16
            )
        )(key)
        w = jax.jit(
            lambda kk: 0.1
            * jax.random.normal(kk, (k, k, 1, ch), jnp.bfloat16)
        )(key)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x,
                w,
                (stride, stride),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=ch,
            )

        @jax.jit
        def fwd(x, w, n):
            def body(_, carry):
                xx, acc = carry
                y = conv(xx, w)
                acc = acc + jnp.sum(y).astype(jnp.float32)
                xx = xx + (acc * 0).astype(xx.dtype)
                return xx, acc

            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

        wu = fwd(x, w, 1)
        float(np.asarray(wu))
        t0 = time.perf_counter()
        out = fwd(x, w, iters)
        float(np.asarray(out))
        ms = (time.perf_counter() - t0) / iters * 1e3

        out_sp = -(-spatial // stride)
        gflop = batch * out_sp * out_sp * ch * k * k * 2 / 1e9
        # HBM bytes (bf16 in + out; weights negligible).
        gbytes = (
            (batch * spatial * spatial * ch + batch * out_sp * out_sp * ch)
            * 2
            / 1e9
        )
        row = {
            "layer": f"dw{k}x{k}s{stride}_c{ch}_{spatial}",
            "ms": round(ms, 3),
            "gflop": round(gflop, 2),
            "gflops_per_s": round(gflop / (ms / 1e3), 1),
            "gb_per_s": round(gbytes / (ms / 1e3), 1),
        }
        rows.append(row)
        total_ms += ms
        total_gflop += gflop
        print(json.dumps(row), flush=True)

    print(
        json.dumps(
            {
                "total_dw_ms": round(total_ms, 2),
                "total_gflop": round(total_gflop, 2),
                "avg_gflops_per_s": round(total_gflop / (total_ms / 1e3), 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    main(batch, size, iters)
