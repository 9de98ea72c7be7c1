"""Backward-pass attribution for the flagship train step (round-3+).

The loss stage is down to 23 ms (matching-tail MXU reformulation); the
remaining step cost is fwd+bwd (~360 of 367 ms at bs=128/840²). This
probe attributes it:

  1. backbone-only fwd and fwd+bwd (is the backward also ~83% backbone,
     like the forward?);
  2. per-layer depthwise conv fwd / input-grad (dgrad) / filter-grad
     (wgrad) at the flagship's layer shapes — XLA lowers depthwise
     wgrad very differently from fwd, and a pathological layer would be
     a Pallas-kernel candidate.

Chained methodology (carry threaded, full-output reduction).

Usage: python scripts/bench_bwd_parts.py [batch] [size]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu.models import mobilenet as M


def timed(fn, args, iters, tag):
    w = fn(*args, 1)
    float(np.asarray(w))
    t0 = time.perf_counter()
    out = fn(*args, iters)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"part": tag, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def backbone_probe(batch, size, iters):
    model = M.MobileNetV3Backbone(
        stages=tuple(tuple(s) for s in M.MNV3_LARGE_3STAGE),
        block_attention="eca",
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 50, (batch, size, size, 3)).astype(np.float32)
    )
    variables = jax.jit(
        lambda r, i: model.init(r, i, False)
    )(jax.random.PRNGKey(0), images[:1])

    @jax.jit
    def fwd(variables, imgs, n):
        def body(_, carry):
            im, acc = carry
            out, _ = model.apply(
                variables, im.astype(jnp.bfloat16), True,
                mutable=["batch_stats"],
            )
            acc = acc + sum(jnp.sum(o).astype(jnp.float32) for o in out)
            im = im + (acc * 0).astype(im.dtype)
            return im, acc

        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0)))[1]

    @jax.jit
    def fwd_bwd(variables, imgs, n):
        def lf(params, bs, im):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs},
                im.astype(jnp.bfloat16), True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(o).astype(jnp.float32) for o in out)

        def body(_, carry):
            im, acc = carry
            val, grads = jax.value_and_grad(lf)(
                variables["params"], variables["batch_stats"], im
            )
            acc = (
                acc
                + val
                + sum(
                    jnp.sum(g).astype(jnp.float32)
                    for g in jax.tree_util.tree_leaves(grads)
                )
            )
            im = im + (acc * 0).astype(im.dtype)
            return im, acc

        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0)))[1]

    timed(fwd, (variables, images), iters, "backbone_fwd_train")
    timed(fwd_bwd, (variables, images), iters, "backbone_fwd_bwd")


# Flagship depthwise layer shapes at 840² input: (spatial, channels,
# kernel, stride) per MNV3_LARGE_3STAGE block (840 -> 420 stem).
DW_SHAPES = [
    (420, 16, 3, 1),
    (420, 64, 3, 2),
    (210, 72, 3, 1),
    (210, 72, 5, 2),
    (105, 120, 5, 1),
    (105, 240, 3, 2),
    (53, 200, 3, 1),
    (53, 480, 3, 1),
    (53, 672, 5, 1),
    (53, 672, 5, 2),
    (27, 960, 5, 1),
]


def dw_probe(batch, iters):
    for spatial, ch, k, stride in DW_SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.normal(0, 1, (batch, spatial, spatial, ch)).astype(
                np.float32
            )
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(0, 0.1, (k, k, 1, ch)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=ch,
            )

        # A REAL random cotangent: with a sum() loss the all-ones
        # cotangent constant-folds (dgrad collapses to a broadcast of
        # sum(w), wgrad to a reduce over x) and the probe measures
        # nothing. vjp against data keeps the true transposed convs.
        out_sp = -(-spatial // stride)
        ct = jnp.asarray(
            rng.normal(0, 1, (batch, out_sp, out_sp, ch)).astype(
                np.float32
            )
        ).astype(jnp.bfloat16)

        @jax.jit
        def fwd(x, w, n):
            def body(_, carry):
                xx, acc = carry
                y = conv(xx, w)
                acc = acc + jnp.sum(y).astype(jnp.float32)
                xx = xx + (acc * 0).astype(xx.dtype)
                return xx, acc

            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

        @jax.jit
        def dgrad(x, w, ct, n):
            def body(_, carry):
                cc, acc = carry
                _, vjp = jax.vjp(lambda xi: conv(xi, w), x)
                (g,) = vjp(cc)
                acc = acc + jnp.sum(g).astype(jnp.float32)
                cc = cc + (acc * 0).astype(cc.dtype)
                return cc, acc

            return jax.lax.fori_loop(0, n, body, (ct, jnp.float32(0)))[1]

        @jax.jit
        def wgrad(x, w, ct, n):
            def body(_, carry):
                cc, acc = carry
                _, vjp = jax.vjp(lambda wi: conv(x, wi), w)
                (g,) = vjp(cc)
                acc = acc + jnp.sum(g).astype(jnp.float32)
                cc = cc + (acc * 0).astype(cc.dtype)
                return cc, acc

            return jax.lax.fori_loop(0, n, body, (ct, jnp.float32(0)))[1]

        tag = f"dw{k}x{k}s{stride}_c{ch}_{spatial}"
        t_f = timed(fwd, (x, w), iters, tag + "_fwd")
        t_d = timed(dgrad, (x, w, ct), iters, tag + "_dgrad")
        t_w = timed(wgrad, (x, w, ct), iters, tag + "_wgrad")
        print(
            json.dumps(
                {
                    "layer": tag,
                    "dgrad/fwd": round(t_d / t_f, 2),
                    "wgrad/fwd": round(t_w / t_f, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 840
    which = sys.argv[3] if len(sys.argv) > 3 else "backbone"
    if which in ("backbone", "all"):
        backbone_probe(batch, size, iters=5)
    if which in ("dw", "all"):
        dw_probe(batch, iters=10)
