"""Is the matching cost in the finish_match tail (dynamic gathers)?

Times the shared finish_match tail alone at flagship shapes, then an
MXU reformulation of its gathers (one-hot matmul against the [G,15]
GT table) for comparison.

Usage: python scripts/bench_finish_match.py [batch] [iters]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs
from jabd_tpu.ops import anchors as A
from jabd_tpu.ops import matching as MX


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    g, size = 128, 840

    mcfg = configs.get_model_config("jabd_flagship")
    priors = jnp.asarray(A.generate_anchors(mcfg.anchors, (size, size)))
    p = priors.shape[0]

    rng = np.random.default_rng(0)
    bt_ov = jnp.asarray(rng.uniform(0, 1, (batch, p)).astype(np.float32))
    bt_ix = jnp.asarray(rng.integers(0, 12, (batch, p)).astype(np.int32))
    bp_ix = jnp.asarray(rng.integers(0, p, (batch, g)).astype(np.int32))
    cxy = rng.uniform(0.2, 0.8, (batch, g, 2))
    wh = rng.uniform(0.02, 0.2, (batch, g, 2))
    truths = jnp.asarray(
        np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    )
    labels = jnp.ones((batch, g), jnp.float32)
    landms = jnp.asarray(rng.uniform(0, 1, (batch, g, 10)).astype(np.float32))
    valid_np = np.zeros((batch, g), bool)
    valid_np[:, :12] = True
    valid = jnp.asarray(valid_np)

    def tail(ov, ix, bp, t, l, lm, v):
        return MX.finish_match(
            0.35, ov, ix, bp, t, priors, (0.1, 0.2), l, lm, v
        )

    fn = jax.vmap(tail)

    def run(args):
        return fn(*args)

    args = (bt_ov, bt_ix, bp_ix, truths, labels, landms, valid)

    @jax.jit
    def chained(args, it):
        def body(_, carry):
            a, acc = carry
            m = run(a)
            acc = acc + sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(m)
            )
            a = (a[0] + (acc * 0).astype(a[0].dtype),) + a[1:]
            return a, acc

        return jax.lax.fori_loop(0, it, body, (args, jnp.float32(0)))[1]

    float(np.asarray(chained(args, 1)))
    t0 = time.perf_counter()
    float(np.asarray(chained(args, iters)))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"part": "finish_match", "ms": round(dt * 1e3, 2)}),
          flush=True)

    # --- MXU gather reformulation probe: one-hot matmul table lookup ---
    def tail_mxu(ov, ix, bp, t, l, lm, v):
        gt_ids = jnp.arange(g)
        forced_gt = (
            jnp.full((p,), -1, dtype=gt_ids.dtype)
            .at[bp]
            .max(jnp.where(v, gt_ids, -1))
        )
        is_forced = forced_gt >= 0
        ix = jnp.where(is_forced, forced_gt, ix)
        ov = jnp.where(is_forced, 2.0, ov)
        table = jnp.concatenate([t, l[:, None], lm], axis=1)  # [G, 15]
        onehot = (ix[:, None] == gt_ids[None, :]).astype(jnp.float32)
        picked = jax.lax.dot(
            onehot, table, precision=jax.lax.Precision.HIGHEST
        )  # [P, 15]
        matches, conf, lms = picked[:, :4], picked[:, 4], picked[:, 5:]
        conf = jnp.where(ov < 0.35, 0.0, conf)
        from jabd_tpu.ops import boxes as BX

        loc = BX.encode(matches, priors, (0.1, 0.2))
        landm = BX.encode_landm(lms, priors, (0.1, 0.2))
        fg = (conf != 0.0)[:, None]
        return MX.MatchResult(
            loc_t=jnp.where(fg, loc, 0.0),
            conf_t=conf,
            landm_t=jnp.where(fg, landm, 0.0),
            box_t=jnp.where(fg, matches, 0.0),
        )

    fn2 = jax.vmap(tail_mxu)

    # parity first
    m1 = jax.jit(lambda a: fn(*a))(args)
    m2 = jax.jit(lambda a: fn2(*a))(args)
    for x, y in zip(m1, m2):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-5
        )
    print("mxu tail parity ok", flush=True)

    @jax.jit
    def chained2(args, it):
        def body(_, carry):
            a, acc = carry
            m = fn2(*a)
            acc = acc + sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(m)
            )
            a = (a[0] + (acc * 0).astype(a[0].dtype),) + a[1:]
            return a, acc

        return jax.lax.fori_loop(0, it, body, (args, jnp.float32(0)))[1]

    float(np.asarray(chained2(args, 1)))
    t0 = time.perf_counter()
    float(np.asarray(chained2(args, iters)))
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps({"part": "finish_match_mxu", "ms": round(dt * 1e3, 2)}),
        flush=True,
    )


if __name__ == "__main__":
    main()
