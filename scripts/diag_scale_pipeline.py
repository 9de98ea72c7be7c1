"""Diagnose the at-scale input pipeline: time each stage of the
device-augment train loop separately on the real TPU.

Stages: (a) loader only (host decode+plan+stack), (b) loader + H2D puts,
(c) full loop (puts + step dispatch), with per-step wall prints and RSS.

    python scripts/diag_scale_pipeline.py [--batch 96] [--steps 12]
"""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()

    import tempfile

    from scripts.train_at_scale import build_tree

    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="diag_wider_")
    n_imgs = args.batch * 3
    label_txt, _ = build_tree(root, n_imgs, rng)

    import jax
    import jax.numpy as jnp

    from jabd_tpu import configs, losses, train
    from jabd_tpu.data import wider as W
    from jabd_tpu.data.device_augment import device_train_loader
    from jabd_tpu.parallel import mesh as M

    ds = W.WiderFaceDataset(label_txt, input_size=args.size)
    bucket = (480, 576)
    mesh = M.make_mesh_for_batch(args.batch)

    def fresh_loader(seed):
        return device_train_loader(
            ds, args.batch, bucket_hw=bucket, max_targets=32, seed=seed
        )

    def to_batch(item):
        images_u8, plan, (boxes, labels, landms, valid) = item
        return (images_u8, plan, boxes, labels, landms, valid)

    # --- (a) loader only
    t0 = time.perf_counter()
    cnt = 0
    for seed in range(100):
        for item in fresh_loader(seed):
            cnt += 1
            t1 = time.perf_counter()
            print(f"a loader-only step {cnt}: {t1 - t0:.2f}s rss={rss_gb():.1f}")
            t0 = t1
            if cnt >= args.steps:
                break
        if cnt >= args.steps:
            break

    # --- (b) loader + puts (block on the put by fetching a tiny consume)
    tiny = jax.jit(lambda im: im[0, 0, 0, 0].astype(jnp.int32))
    t0 = time.perf_counter()
    cnt = 0
    for seed in range(100, 200):
        for batch in M.prefetch_to_device(
            map(to_batch, fresh_loader(seed)), mesh, depth=2
        ):
            cnt += 1
            t1 = time.perf_counter()
            print(f"b loader+put step {cnt}: {t1 - t0:.2f}s rss={rss_gb():.1f}")
            t0 = t1
            if cnt >= args.steps:
                break
        if cnt >= args.steps:
            break

    # --- (c) full loop
    mcfg = configs.get_model_config("jabd_flagship")
    tcfg = configs.TrainConfig(
        batch_size=args.batch, image_size=args.size, max_targets=32,
        total_epochs=2, freeze_epochs=0, device_augment=True,
        augment_bucket=bucket,
    )
    steps_per_epoch = max(len(ds) // args.batch, 1)
    state = train.create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, steps_per_epoch, lr=1e-3,
        freeze_backbone=False,
    )
    state = M.replicate_tree(state, mesh)
    from jabd_tpu.ops import anchors as A

    anchors = jnp.asarray(
        A.generate_anchors(mcfg.anchors, (args.size, args.size))
    )
    step_fn = train.make_train_step(mcfg, tcfg)

    print("c compiling...", flush=True)
    losses_acc = []
    t_compile = time.perf_counter()
    t0 = time.perf_counter()
    cnt = 0
    for seed in range(200, 300):
        for batch in M.prefetch_to_device(
            map(to_batch, fresh_loader(seed)), mesh, depth=2
        ):
            images_d, plan_d, boxes_d, labels_d, landms_d, valid_d = batch
            targets = losses.Targets(
                boxes=boxes_d, labels=labels_d, landms=landms_d,
                valid=valid_d,
            )
            state, metrics = step_fn(state, images_d, plan_d, targets, anchors)
            losses_acc.append(metrics["loss"])
            cnt += 1
            t1 = time.perf_counter()
            tag = " (incl compile)" if cnt == 1 else ""
            print(
                f"c full step {cnt}: {t1 - t0:.2f}s rss={rss_gb():.1f}{tag}",
                flush=True,
            )
            t0 = t1
            if cnt >= args.steps * 2:
                break
        if cnt >= args.steps * 2:
            break
    mean = float(jnp.mean(jnp.stack(losses_acc)))
    t_total = time.perf_counter() - t_compile
    print(
        f"c done: {cnt} steps, mean loss {mean:.3f}, total {t_total:.1f}s "
        f"({t_total / cnt:.2f}s/step incl compile+final fetch)"
    )

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
