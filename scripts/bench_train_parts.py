"""Train-step component breakdown on the real TPU (round-3 lever hunt;
round 4 adds --model + per-part MFU for the re50 attribution ask).

Measures, with the chained methodology (utils/profiling.chained_benchmark
pattern: carry threaded, full-output reduction), at train shapes:

  fwd_eval    - eval-mode forward (running-stat BN)
  fwd_train   - train-mode forward (batch-stat BN)
  fwd_bwd     - train forward + backward of sum(outputs) (no loss stage)
  loss_only   - matching + MultiBox loss on fixed predictions
  full_step   - the production train step (fwd + loss + bwd + Adam)

Each part also reports achieved TFLOP/s and MFU (XLA cost_analysis FLOPs
of the UNchained single call / measured per-iter time / v5e bf16 peak).

Usage: python scripts/bench_train_parts.py [batch] [size] [iters] [parts]
                                           [model]
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


V5E_BF16_PEAK = 197e12  # TPU v5e bf16 MXU peak FLOP/s


def timed(fn, args, iters, tag, flops=None):
    """fn(args_tuple, n) -> scalar; chained inside fn. flops: cost of ONE
    iteration (for achieved-TFLOP/s + MFU columns)."""
    w = fn(*args, 1)
    float(np.asarray(w))
    t0 = time.perf_counter()
    out = fn(*args, iters)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / iters
    rec = {"part": tag, "ms": round(dt * 1e3, 1)}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 1)
        rec["mfu_pct"] = round(100 * flops / dt / V5E_BF16_PEAK, 1)
    print(json.dumps(rec), flush=True)
    return dt


def flops_or_none(fn, *args):
    """cost_analysis FLOPs of the single (unchained) call; None on
    backends that don't report it."""
    try:
        from jabd_tpu.utils.profiling import flops_of

        f = flops_of(fn, *args)
        return None if f != f else f  # NaN -> None
    except Exception:
        return None


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 840
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    only = (
        set(sys.argv[4].split(","))
        if len(sys.argv) > 4 and sys.argv[4] != "all"
        else None
    )
    preset = sys.argv[5] if len(sys.argv) > 5 else "jabd_flagship"

    def want(tag):
        return only is None or tag in only

    mcfg = configs.get_model_config(preset)
    print(
        json.dumps({"model": preset, "batch": batch, "size": size}),
        flush=True,
    )
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
        fl = flops_or_none(
            lambda v, im: model.apply(v, im, train=False), variables, images
        )
        timed(fwd_eval, (variables, images), iters, "fwd_eval", fl)

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
        fl = flops_or_none(
            lambda v, im: model.apply(
                v, im, train=True, mutable=["batch_stats"]
            ),
            variables,
            images,
        )
        timed(fwd_train, (variables, images), iters, "fwd_train", fl)

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

        def _lf(params, bs, im):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs}, im, train=True,
                mutable=["batch_stats"],
            )
            return sum(jnp.sum(o) for o in out)

        fl = flops_or_none(
            lambda v, im: jax.value_and_grad(_lf)(
                v["params"], v["batch_stats"], im
            ),
            variables,
            images,
        )
        timed(fwd_bwd, (variables, images), iters, "fwd_bwd", fl)

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
        fl = flops_or_none(
            lambda pr, tg: losses.multibox_loss(
                pr, anchors, tg,
                overlap_threshold=tcfg.overlap_threshold,
                neg_pos_ratio=tcfg.neg_pos_ratio,
                variances=mcfg.anchors.variance,
            ),
            preds,
            targets,
        )
        timed(loss_only, (preds, targets), iters, "loss_only", fl)

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
        fl = flops_or_none(
            lambda st, im, tg: raw_step(st, im, tg, anchors),
            state,
            images,
            targets,
        )
        timed(full, (state, images, targets), iters, "full_step", fl)


if __name__ == "__main__":
    main()
