"""Device-side augmentation benchmark (real TPU).

Three measurements at the flagship train configuration (840x840):
  1. host plan throughput — img/s/core of decode-free plan building
     (draws + box transform + resample-matrix fill + pad), the only
     per-sample host work left in device-augment mode;
  2. device augment cost — ms/batch of the MXU resample + fused HSV
     chain alone (chained fori_loop, honest under the async tunnel);
  3. augmented train step — full step (augment + fwd + loss + bwd +
     Adam) vs the plain step's BENCH_NOTES numbers.

Usage: python scripts/bench_device_augment.py [batch] [size]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main(batch=34, size=840, bucket=1024, iters=5):
    import jax
    import jax.numpy as jnp

    from jabd_tpu import configs, losses, train
    from jabd_tpu.data import device_augment as DA
    from jabd_tpu.data import wider as W
    from jabd_tpu.ops import anchors as A

    rng = np.random.default_rng(0)
    # Typical WIDER source: ~1024x768 uint8.
    raws = [
        rng.integers(0, 255, (768, 1024, 3), np.uint8) for _ in range(8)
    ]
    box = np.zeros((12, 15), np.float32)
    box[:, 0] = rng.uniform(10, 900, 12)
    box[:, 1] = rng.uniform(10, 700, 12)
    box[:, 2] = box[:, 0] + rng.uniform(8, 60, 12)
    box[:, 3] = box[:, 1] + rng.uniform(8, 60, 12)
    box[:, 4:14] = 100.0
    box[:, 14] = 1.0

    # 1. host planning throughput
    n = 24
    t0 = time.perf_counter()
    parts_all = []
    for i in range(n):
        padded, parts, boxes = DA.plan_sample(
            raws[i % 8], box, size, np.random.default_rng(i),
            (bucket, bucket),
        )
        parts_all.append((padded, parts, boxes))
    host_dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "host_plan_ms_per_img": round(host_dt * 1e3, 2),
        "host_plan_img_per_s_core": round(1 / host_dt, 1),
    }), flush=True)

    # Build a full batch by cycling the planned samples.
    images = np.stack([parts_all[i % n][0] for i in range(batch)])
    plan = DA.stack_plans([parts_all[i % n][1] for i in range(batch)])
    tgts = W.batch_targets(
        [parts_all[i % n][2] for i in range(batch)], 128
    )

    images_d = jnp.asarray(images)
    plan_d = jax.tree_util.tree_map(jnp.asarray, plan)

    # 2. device augment alone (chained)
    # Two fantasy-number traps: (1) consume the FULL output — a partial
    # consumer (y[0,0,0]) lets XLA DCE most of the augment; (2) thread
    # the carry back into the INPUT — a loop-invariant body gets hoisted
    # and computed once regardless of nit.
    @jax.jit
    def chained_aug(x, plan, nit):
        def body(_, carry):
            xc, acc = carry
            y = DA.device_augment(xc, plan)
            acc = acc + jnp.sum(y).astype(jnp.float32)
            xc = xc + (acc * 0).astype(xc.dtype)
            return xc, acc

        return jax.lax.fori_loop(0, nit, body, (x, jnp.float32(0)))[1]

    float(np.asarray(chained_aug(images_d, plan_d, 1)))
    t0 = time.perf_counter()
    float(np.asarray(chained_aug(images_d, plan_d, iters * 4)))
    aug_dt = (time.perf_counter() - t0) / (iters * 4)
    print(json.dumps({
        "device_augment_ms_per_batch": round(aug_dt * 1e3, 2),
        "batch": batch,
        "device_augment_img_per_s": round(batch / aug_dt, 1),
    }), flush=True)

    # 3. full augmented train step (chained, state as carry)
    mcfg = configs.get_model_config("jabd_flagship")
    tcfg = configs.TrainConfig(
        batch_size=batch, image_size=size, device_augment=True,
        augment_bucket=(bucket, bucket),
    )
    state = train.create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, steps_per_epoch=100,
        image_size=size,
    )
    raw_step = train.make_train_step(mcfg, tcfg).__wrapped__
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (size, size)))
    targets = losses.Targets(
        boxes=jnp.asarray(tgts[0]), labels=jnp.asarray(tgts[1]),
        landms=jnp.asarray(tgts[2]), valid=jnp.asarray(tgts[3]),
    )

    # Inputs must be ARGUMENTS, not closures: jit would bake closed-over
    # arrays into the HLO as constants (remote compile rejects >100s MB).
    @jax.jit
    def chained_step(state, images_u8, plan, targets, nit):
        def body(_, carry):
            st, acc = carry
            st, m = raw_step(st, images_u8, plan, targets, anchors)
            return st, acc + m["loss"]

        return jax.lax.fori_loop(0, nit, body, (state, jnp.float32(0)))

    _, warm = chained_step(state, images_d, plan_d, targets, 1)
    float(np.asarray(warm))
    t0 = time.perf_counter()
    _, acc = chained_step(state, images_d, plan_d, targets, iters)
    float(np.asarray(acc))
    step_dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "aug_train_step_ms": round(step_dt * 1e3, 1),
        "aug_train_img_per_s": round(batch / step_dt, 1),
        "loss_finite": bool(np.isfinite(float(np.asarray(acc)))),
    }), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
