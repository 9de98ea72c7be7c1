"""Anchor-matching implementations microbench at flagship train shapes.

Times ops/matching.match_batch (dense XLA [B,G,P]) vs
ops/matching_pallas.match_batch_pallas (O(P) fused kernel) with the
chained harness, checking MatchResults agree first.

Usage: python scripts/bench_matching.py [batch] [valid_gts] [iters]
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
    nvalid = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    g = 128
    size = 840

    mcfg = configs.get_model_config("jabd_flagship")
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (size, size)))

    rng = np.random.default_rng(0)
    cxy = rng.uniform(0.2, 0.8, (batch, g, 2))
    wh = rng.uniform(0.02, 0.2, (batch, g, 2))
    boxes = jnp.asarray(
        np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    )
    labels = jnp.ones((batch, g), jnp.float32)
    landms = jnp.asarray(rng.uniform(0, 1, (batch, g, 10)).astype(np.float32))
    valid_np = np.zeros((batch, g), bool)
    valid_np[:, :nvalid] = True
    valid = jnp.asarray(valid_np)

    from jabd_tpu.ops.matching_pallas import match_batch_pallas

    impls = {"xla": MX.match_batch, "pallas": match_batch_pallas}

    outs = {}
    for name, fn in impls.items():
        outs[name] = jax.jit(
            lambda b, v, fn=fn: fn(
                0.35, b, anchors, (0.1, 0.2), labels, landms, v
            )
        )(boxes, valid)
    for a, b in zip(outs["xla"], outs["pallas"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    print("parity ok", flush=True)

    for name, fn in impls.items():
        @jax.jit
        def chained(b, v, it, fn=fn):
            def body(_, carry):
                bc, acc = carry
                m = fn(0.35, bc, anchors, (0.1, 0.2), labels, landms, v)
                acc = acc + sum(
                    jnp.sum(l).astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(m)
                )
                bc = bc + (acc * 0).astype(bc.dtype)
                return bc, acc

            return jax.lax.fori_loop(0, it, body, (b, jnp.float32(0)))[1]

        float(np.asarray(chained(boxes, valid, 1)))
        t0 = time.perf_counter()
        float(np.asarray(chained(boxes, valid, iters)))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"impl": name, "ms": round(dt * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
