"""Train-step component breakdown on the real TPU (round-3 lever hunt).

Measures, with the chained methodology (utils/profiling.chained_benchmark
pattern: carry threaded, full-output reduction), at flagship train shapes:

  fwd_eval    - eval-mode forward (running-stat BN)
  fwd_train   - train-mode forward (batch-stat BN)
  fwd_bwd     - train forward + backward of sum(outputs) (no loss stage)
  loss_only   - matching + MultiBox loss on fixed predictions
  full_step   - the production train step (fwd + loss + bwd + Adam)

Usage: python scripts/bench_train_parts.py [batch] [size] [iters] [parts]
  parts: comma-separated subset (default all), e.g. loss_only,full_step
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs, losses, train
from jabd_tpu.models import build_model
from jabd_tpu.ops import anchors as A


def timed(fn, args, iters, tag):
    """fn(args_tuple, n) -> scalar; chained inside fn."""
    w = fn(*args, 1)
    float(np.asarray(w))
    t0 = time.perf_counter()
    out = fn(*args, iters)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"part": tag, "ms": round(dt * 1e3, 1)}), flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 840
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    def want(tag):
        return only is None or tag in only

    mcfg = configs.get_model_config("jabd_flagship")
    tcfg = configs.TrainConfig(batch_size=batch, image_size=size)
    model = build_model(mcfg, mode="train")

    state = train.create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, steps_per_epoch=100,
        image_size=size,
    )
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (size, size)))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 50, (batch, size, size, 3)).astype(np.float32)
    )
    g = tcfg.max_targets
    cxy = rng.uniform(0.2, 0.8, (batch, g, 2))
    wh = rng.uniform(0.02, 0.2, (batch, g, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    valid = np.zeros((batch, g), bool)
    valid[:, :12] = True
    targets = losses.Targets(
        boxes=jnp.asarray(boxes.astype(np.float32)),
        labels=jnp.ones((batch, g), jnp.float32),
        landms=jnp.asarray(rng.uniform(0, 1, (batch, g, 10)).astype(np.float32)),
        valid=jnp.asarray(valid),
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # --- fwd eval ---
    @jax.jit
    def fwd_eval(variables, imgs, n):
        def body(_, carry):
            im, acc = carry
            out = model.apply(variables, im, train=False)
            acc = acc + sum(jnp.sum(o).astype(jnp.float32) for o in out)
            im = im + (acc * 0).astype(im.dtype)
            return im, acc

        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0)))[1]

    if want("fwd_eval"):
        timed(fwd_eval, (variables, images), iters, "fwd_eval")

    # --- fwd train-mode ---
    @jax.jit
    def fwd_train(variables, imgs, n):
        def body(_, carry):
            im, acc = carry
            out, _ = model.apply(
                variables, im, train=True, mutable=["batch_stats"]
            )
            acc = acc + sum(jnp.sum(o).astype(jnp.float32) for o in out)
            im = im + (acc * 0).astype(im.dtype)
            return im, acc

        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0)))[1]

    if want("fwd_train"):
        timed(fwd_train, (variables, images), iters, "fwd_train")

    # --- fwd + bwd (sum-loss, no matching stage) ---
    @jax.jit
    def fwd_bwd(variables, imgs, n):
        def lf(params, bs, im):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs}, im, train=True,
                mutable=["batch_stats"],
            )
            return sum(jnp.sum(o) for o in out)

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

    if want("fwd_bwd"):
        timed(fwd_bwd, (variables, images), iters, "fwd_bwd")

    # --- loss only (fixed predictions) ---
    p = anchors.shape[0]
    preds = (
        jnp.asarray(rng.normal(0, 0.1, (batch, p, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 1.0, (batch, p, 2)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (batch, p, 10)).astype(np.float32)),
    )

    @jax.jit
    def loss_only(preds, targets, n):
        def body(_, carry):
            pr, acc = carry
            parts = losses.multibox_loss(
                pr, anchors, targets,
                overlap_threshold=tcfg.overlap_threshold,
                neg_pos_ratio=tcfg.neg_pos_ratio,
                variances=mcfg.anchors.variance,
            )
            acc = acc + losses.total_loss(parts, tcfg.loc_weight)
            pr = tuple(x + (acc * 0).astype(x.dtype) for x in pr)
            return pr, acc

        return jax.lax.fori_loop(0, n, body, (preds, jnp.float32(0)))[1]

    if want("loss_only"):
        timed(loss_only, (preds, targets), iters, "loss_only")

    # --- full step ---
    raw_step = train.make_train_step(mcfg, tcfg).__wrapped__

    @jax.jit
    def full(state, imgs, targets, n):
        def body(_, carry):
            st, acc = carry
            st, metrics = raw_step(st, imgs, targets, anchors)
            return st, acc + metrics["loss"]

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))[1]

    if want("full_step"):
        timed(full, (state, images, targets), iters, "full_step")


if __name__ == "__main__":
    main()
