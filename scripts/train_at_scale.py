"""Train-at-scale proof on the real TPU (round-3 VERDICT ask #7).

Runs the PRODUCTION `train.fit` loop — not a hand-rolled step loop — for
~2k steps at production batch size through the device-augment path on a
synthetic WIDER-format tree, exercising everything the unit tests only
approximate together:

  * Orbax periodic checkpoints + AUTO-RESUME mid-run (fit is invoked
    twice: the first call stops at an epoch boundary mid-recipe, the
    second picks up from the latest checkpoint with its optimizer state);
  * donated train state across thousands of dispatches;
  * host decode -> plan building -> prefetch_to_device overlap (the
    input-pipelining reality: one CPU core feeding the chip);
  * loss-curve logging (LossHistory txt + PNG);
  * final eval through the BATCHED map-txt path + the WIDER evaluator
    (cli map-txt --batch-size equivalent) on a held-out synthetic val
    tree.

Reference analog: utils/utils_fit_change.py:11-64 epoch loop +
train_mobilenetV3_ecagai.py:553-615 recipe.

    python scripts/train_at_scale.py [--steps 2000] [--batch 96]
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tree(root: str, n: int, rng, subdir="images", src_scale=1.0):
    """Mini WIDER-format label.txt tree: bright squares as 'faces'.

    src_scale shrinks the source image size range; the at-scale runner
    uses <1 in this environment because the remote-TPU tunnel moves
    H2D at only ~55 MB/s with multi-second contention windows (measured,
    BENCH_NOTES round 3) — in production the sources ride local PCIe and
    the full-size range is the realistic choice."""
    import cv2

    os.makedirs(os.path.join(root, subdir), exist_ok=True)
    lines = []
    gt = {}
    for i in range(n):
        h = int(rng.integers(240, 480) * src_scale)
        w = int(rng.integers(280, 560) * src_scale)
        img = np.full((h, w, 3), 30, np.uint8)
        img += rng.integers(0, 12, (h, w, 3), np.uint8)  # mild noise
        name = f"img_{i}.jpg"
        lines.append(f"# {name}")
        boxes = []
        for _ in range(int(rng.integers(1, 4))):
            s = int(rng.integers(max(28, min(h, w) // 8), min(h, w) // 3))
            x = int(rng.integers(0, w - s))
            y = int(rng.integers(0, h - s))
            img[y : y + s, x : x + s] = int(rng.uniform(150, 230))
            lm = " ".join(["-1.0 -1.0 -1.0"] * 5)
            lines.append(f"{x} {y} {s} {s} {lm} 1.0")
            boxes.append([x, y, s, s])
        gt[f"img_{i}"] = boxes
        cv2.imwrite(os.path.join(root, subdir, name), img)
    path = os.path.join(root, "label.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--images", type=int, default=1344)
    ap.add_argument(
        "--src-scale", type=float, default=1.0,
        help="shrink synthetic source images (tunnel-bound envs)",
    )
    ap.add_argument("--model", default="jabd_flagship")
    ap.add_argument("--keep", action="store_true", help="keep artifacts")
    ap.add_argument(
        "--force-cpu", action="store_true",
        help="CPU smoke mode (env preset JAX_PLATFORMS=axon needs both "
        "the env var and the config update to override)",
    )
    args = ap.parse_args()

    if args.force_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from jabd_tpu import configs, train
    from jabd_tpu.data import wider as W
    from jabd_tpu.utils import compile_cache
    from jabd_tpu.utils.checkpoint import CheckpointManager

    compile_cache.enable()
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="scale_wider_")
    label_txt, _ = build_tree(
        root, args.images, rng, src_scale=args.src_scale
    )
    ds = W.WiderFaceDataset(label_txt, input_size=args.size)

    steps_per_epoch = max(len(ds) // args.batch, 1)
    total_epochs = max(args.steps // steps_per_epoch, 2)
    mid_epochs = total_epochs // 2
    save_period = max(total_epochs // 10, 1)

    # Right-size the augment bucket to the dataset (PIL reads dimensions
    # from the header without decoding): every padded byte of the
    # default 1024² bucket is H2D traffic through the remote tunnel —
    # measured as THE input-pipeline wall at bs=96 (302 MB/batch of
    # mostly-padding u8 + dense plan matrices; see BENCH_NOTES round 3).
    from PIL import Image

    mh = mw = 1
    for p in ds.imgs_path:
        with Image.open(p) as im:
            w, h = im.size
        mh, mw = max(mh, h), max(mw, w)
    bucket = (min(-(-mh // 32) * 32, 1024), min(-(-mw // 32) * 32, 1024))
    print(json.dumps({"augment_bucket": bucket}), flush=True)

    mcfg = configs.get_model_config(args.model)
    base = dict(
        batch_size=args.batch,
        image_size=args.size,
        max_targets=32,
        freeze_epochs=0,  # single unfreeze phase; resume is the target
        save_period=save_period,
        device_augment=True,
        augment_bucket=bucket,
        lr_unfreeze=1e-3,
    )
    ckpt_dir = os.path.join(root, "ckpt")
    log_dir = os.path.join(root, "logs")

    print(
        json.dumps(
            {
                "images": len(ds),
                "steps_per_epoch": steps_per_epoch,
                "total_epochs": total_epochs,
                "interrupt_at": mid_epochs,
                "total_steps": steps_per_epoch * total_epochs,
            }
        ),
        flush=True,
    )

    # --- Phase A: train to the midpoint, then stop (simulated interrupt
    # at an epoch boundary; the checkpoint there carries optimizer state).
    t0 = time.time()
    tcfg_a = configs.TrainConfig(total_epochs=mid_epochs, **base)
    train.fit(
        mcfg, tcfg_a, ds, log_dir=log_dir,
        checkpoint_manager=CheckpointManager(ckpt_dir),
    )
    t_a = time.time() - t0
    print(f"phase A done: {mid_epochs} epochs in {t_a:.0f}s", flush=True)

    # --- Phase B: fresh fit() call with the FULL epoch budget — must
    # auto-resume from the phase-A checkpoint (not restart from scratch).
    t0 = time.time()
    tcfg_b = configs.TrainConfig(total_epochs=total_epochs, **base)
    state = train.fit(
        mcfg, tcfg_b, ds, log_dir=log_dir,
        checkpoint_manager=CheckpointManager(ckpt_dir),
    )
    t_b = time.time() - t0
    done_steps = int(np.asarray(state.step))
    print(
        f"phase B done: resumed -> epoch {total_epochs}, "
        f"{t_b:.0f}s, state.step={done_steps}",
        flush=True,
    )
    expect_steps = steps_per_epoch * total_epochs
    assert done_steps == expect_steps, (done_steps, expect_steps)
    # Resume discriminator: phase B's own loss log (the newest
    # loss_<ts> dir) must contain ONLY the epochs after the interrupt —
    # a from-scratch restart would log all total_epochs.
    phase_b_log = sorted(os.listdir(log_dir))[-1]
    b_epochs = len(
        open(os.path.join(log_dir, phase_b_log, "epoch_loss.txt"))
        .read()
        .split()
    )
    assert b_epochs == total_epochs - mid_epochs, (
        "resume restarted from scratch?",
        b_epochs,
        total_epochs - mid_epochs,
    )

    # Wall-clock throughput of the steady phase (includes host decode +
    # plan building + H2D through prefetch_to_device — the e2e input
    # pipeline, not just device step time).
    imgs_b = (total_epochs - mid_epochs) * steps_per_epoch * args.batch
    print(
        json.dumps(
            {
                "e2e_img_per_sec_phaseB": round(imgs_b / t_b, 1),
                "note": "includes compile+resume overhead of phase B",
            }
        ),
        flush=True,
    )

    # Loss curve sanity: first logged epoch vs last (LossHistory writes
    # log_dir/loss_<ts>/epoch_loss.txt per fit() invocation — phase A and
    # the resumed phase B each get one; concatenate in time order).
    losses_log = []
    for d in sorted(os.listdir(log_dir)):
        p = os.path.join(log_dir, d, "epoch_loss.txt")
        if os.path.isfile(p):
            losses_log += [float(x) for x in open(p).read().split()]
    print(
        f"loss curve: {losses_log[0]:.2f} -> {losses_log[-1]:.2f} "
        f"({len(losses_log)} epochs logged)",
        flush=True,
    )
    smoke = args.steps < 100  # tiny runs check plumbing, not learning
    assert smoke or losses_log[-1] < losses_log[0] * 0.5, (
        "training did not learn"
    )

    # --- Eval the final checkpoint through the CLI surfaces: batched
    # map-txt sweep + WIDER evaluator on a held-out synthetic val tree.
    import cv2

    from jabd_tpu.eval import evaluate_wider
    from jabd_tpu.eval.run_wider import run_wider_val
    from jabd_tpu.models import build_model
    from jabd_tpu.predict import Predictor
    from tests.test_eval import _fake_gt_dir  # synthetic .mat GT builder

    rngv = np.random.default_rng(1)
    _, gt = build_tree(
        os.path.join(root, "val"), 32, rngv, subdir="0--Scale"
    )
    events = {"0--Scale": {k: [b for b in v] for k, v in gt.items()}}

    class _P:  # tmp_path shim for _fake_gt_dir (savemat wants plain str)
        def __init__(self, p):
            self.p = p

        def __truediv__(self, other):
            return os.path.join(self.p, other)

        def __str__(self):
            return self.p

    os.makedirs(os.path.join(root, "gt"), exist_ok=True)
    gt_dir = _fake_gt_dir(_P(os.path.join(root, "gt")), events)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred = Predictor(
        mcfg,
        variables,
        configs.PredictConfig(
            confidence=0.3, input_shape=(args.size, args.size),
            max_detections=128, pre_nms_topk=512,
        ),
    )
    preds = run_wider_val(pred, os.path.join(root, "val"), batch_size=16)
    aps = evaluate_wider(preds, str(gt_dir), iou_thresh=0.4)
    print(json.dumps({k: round(v, 4) for k, v in aps.items()}), flush=True)
    assert smoke or aps["easy"] > 0.5, (
        f"trained model failed held-out eval: {aps}"
    )

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    print("train_at_scale PASSED", flush=True)


if __name__ == "__main__":
    main()
