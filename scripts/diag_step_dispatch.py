"""Isolate per-dispatch cost of the augmented train step through the
tunnel: fixed device-resident batch, N back-to-back dispatches, one
final scalar fetch. Compares against the chained (fori_loop) timing of
the same step to expose pure dispatch overhead.

    python scripts/diag_step_dispatch.py [--batch 96] [--n 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jabd_tpu import configs, losses, train
    from jabd_tpu.data import device_augment as DA
    from jabd_tpu.ops import anchors as A
    from jabd_tpu.parallel import mesh as M

    B = args.batch
    bucket = (480, 576)
    rng = np.random.default_rng(0)
    mesh = M.make_mesh_for_batch(B)

    # One synthetic batch, built once, shipped once.
    parts = []
    srcs = []
    boxes_all = []
    for i in range(B):
        src = rng.integers(20, 200, (400, 500, 3), dtype=np.uint8)
        box = np.zeros((2, 15), np.float32)
        box[:, 0:2] = [[40, 40], [200, 200]]
        box[:, 2:4] = [[120, 120], [300, 300]]
        box[:, 4:14] = 25.0
        box[:, 14] = 1.0
        padded, p, bx = DA.plan_sample(
            src, box, args.size, np.random.default_rng(i), bucket,
            compact=True,
        )
        srcs.append(padded)
        parts.append(p)
        boxes_all.append(bx)
    plan = DA.stack_plans(parts)
    tgts = __import__(
        "jabd_tpu.data.wider", fromlist=["batch_targets"]
    ).batch_targets(boxes_all, 32)

    images_d = M.shard_batch(jnp.asarray(np.stack(srcs)), mesh)
    plan_d = type(plan)(*M.shard_batch(tuple(plan), mesh))
    targets_d = losses.Targets(*M.shard_batch(tuple(tgts), mesh))

    mcfg = configs.get_model_config("jabd_flagship")
    tcfg = configs.TrainConfig(
        batch_size=B, image_size=args.size, max_targets=32,
        total_epochs=2, freeze_epochs=0, device_augment=True,
        augment_bucket=bucket,
    )
    anchors = jnp.asarray(
        A.generate_anchors(mcfg.anchors, (args.size, args.size))
    )
    state = train.create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, 10, lr=1e-3,
        freeze_backbone=False,
    )
    state = M.replicate_tree(state, mesh)
    step_fn = train.make_train_step(mcfg, tcfg)

    n_leaves = len(jax.tree_util.tree_leaves(state))
    print(f"state leaves: {n_leaves}")

    # Warmup/compile.
    t0 = time.perf_counter()
    state, metrics = step_fn(state, images_d, plan_d, targets_d, anchors)
    _ = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    # N dispatches, one final fetch.
    t0 = time.perf_counter()
    for _ in range(args.n):
        state, metrics = step_fn(
            state, images_d, plan_d, targets_d, anchors
        )
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(
        f"dispatch-loop: {args.n} steps in {dt:.1f}s = "
        f"{dt / args.n * 1000:.0f} ms/step (loss {loss:.2f})"
    )

    # Host-side dispatch cost alone (time to RETURN from step_fn).
    t0 = time.perf_counter()
    state, metrics = step_fn(state, images_d, plan_d, targets_d, anchors)
    t_disp = time.perf_counter() - t0
    print(f"single dispatch call (host-side return): {t_disp * 1000:.0f} ms")
    _ = float(metrics["loss"])


if __name__ == "__main__":
    main()
