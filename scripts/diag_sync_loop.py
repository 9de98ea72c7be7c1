"""Per-step-synchronized variant of the full device-augment loop: fetch
the loss every step so each print shows the TRUE cost of (input put +
step execution) for that step. Compares prefetch depths.

    python scripts/diag_sync_loop.py [--batch 96] [--steps 10]
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument(
        "--delete-inputs", action="store_true",
        help="explicitly .delete() batch arrays after the step",
    )
    args = ap.parse_args()

    import tempfile

    from scripts.train_at_scale import build_tree

    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="diag_wider_")
    label_txt, _ = build_tree(root, args.batch * 3, rng)

    import jax
    import jax.numpy as jnp

    from jabd_tpu import configs, losses, train
    from jabd_tpu.data import wider as W
    from jabd_tpu.data.device_augment import device_train_loader
    from jabd_tpu.ops import anchors as A
    from jabd_tpu.parallel import mesh as M

    ds = W.WiderFaceDataset(label_txt, input_size=args.size)
    bucket = (480, 576)
    mesh = M.make_mesh_for_batch(args.batch)

    mcfg = configs.get_model_config("jabd_flagship")
    tcfg = configs.TrainConfig(
        batch_size=args.batch, image_size=args.size, max_targets=32,
        total_epochs=2, freeze_epochs=0, device_augment=True,
        augment_bucket=bucket,
    )
    anchors = jnp.asarray(
        A.generate_anchors(mcfg.anchors, (args.size, args.size))
    )
    state = train.create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, 3, lr=1e-3,
        freeze_backbone=False,
    )
    state = M.replicate_tree(state, mesh)
    step_fn = train.make_train_step(mcfg, tcfg)

    def to_batch(item):
        images_u8, plan, (boxes, labels, landms, valid) = item
        return (images_u8, plan, boxes, labels, landms, valid)

    def batches():
        for seed in range(100):
            yield from map(to_batch, device_train_loader(
                ds, args.batch, bucket_hw=bucket, max_targets=32,
                seed=seed,
            ))

    cnt = 0
    t0 = time.perf_counter()
    for batch in M.prefetch_to_device(batches(), mesh, depth=args.depth):
        images_d, plan_d, boxes_d, labels_d, landms_d, valid_d = batch
        targets = losses.Targets(
            boxes=boxes_d, labels=labels_d, landms=landms_d, valid=valid_d
        )
        state, metrics = step_fn(state, images_d, plan_d, targets, anchors)
        loss = float(metrics["loss"])  # HARD sync every step
        if args.delete_inputs:
            for leaf in jax.tree_util.tree_leaves(batch):
                leaf.delete()
        cnt += 1
        t1 = time.perf_counter()
        tag = " (incl compile)" if cnt == 1 else ""
        try:
            ms = jax.devices()[0].memory_stats() or {}
            mem = ms.get("bytes_in_use", ms.get("bytes_in_use", 0)) / 1e9
        except Exception:
            mem = -1.0
        print(
            f"sync step {cnt}: {t1 - t0:.2f}s loss={loss:.2f} "
            f"hbm={mem:.2f}GB{tag}",
            flush=True,
        )
        t0 = t1
        if cnt >= args.steps:
            break

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
