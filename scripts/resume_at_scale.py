"""Continue a train_at_scale.py run from its --keep artifact dir after
an interruption (crash-recovery resume — the same auto-resume path,
exercised from a fresh process).

    python scripts/resume_at_scale.py /tmp/scale_wider_XXXX \
        [--steps 2000] [--batch 96] [--size 640] [--model jabd_flagship]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--model", default="jabd_flagship")
    args = ap.parse_args()
    root = args.root

    from jabd_tpu import configs, train
    from jabd_tpu.data import wider as W
    from jabd_tpu.utils import compile_cache
    from jabd_tpu.utils.checkpoint import CheckpointManager

    compile_cache.enable()
    ds = W.WiderFaceDataset(
        os.path.join(root, "label.txt"), input_size=args.size
    )
    steps_per_epoch = max(len(ds) // args.batch, 1)
    total_epochs = max(args.steps // steps_per_epoch, 2)

    from PIL import Image

    mh = mw = 1
    for p in ds.imgs_path:
        with Image.open(p) as im:
            w, h = im.size
        mh, mw = max(mh, h), max(mw, w)
    bucket = (min(-(-mh // 32) * 32, 1024), min(-(-mw // 32) * 32, 1024))

    mcfg = configs.get_model_config(args.model)
    ckpt_dir = os.path.join(root, "ckpt")
    log_dir = os.path.join(root, "logs")
    cm = CheckpointManager(ckpt_dir)
    resumed_from = cm.latest_step()
    print(
        json.dumps(
            {"resume_from_epoch": resumed_from, "total_epochs": total_epochs}
        ),
        flush=True,
    )

    tcfg = configs.TrainConfig(
        batch_size=args.batch,
        image_size=args.size,
        max_targets=32,
        freeze_epochs=0,
        save_period=max(total_epochs // 10, 1),
        device_augment=True,
        augment_bucket=bucket,
        lr_unfreeze=1e-3,
        total_epochs=total_epochs,
    )
    t0 = time.time()
    state = train.fit(
        mcfg, tcfg, ds, log_dir=log_dir, checkpoint_manager=cm
    )
    t_c = time.time() - t0
    done_steps = int(np.asarray(state.step))
    expect = steps_per_epoch * total_epochs
    assert done_steps == expect, (done_steps, expect)
    print(
        f"continuation done: epochs {resumed_from}->{total_epochs} in "
        f"{t_c:.0f}s, state.step={done_steps}",
        flush=True,
    )

    # Loss curve across ALL fit invocations (time order).
    losses_log = []
    for d in sorted(os.listdir(log_dir)):
        p = os.path.join(log_dir, d, "epoch_loss.txt")
        if os.path.isfile(p):
            losses_log += [float(x) for x in open(p).read().split()]
    print(
        f"loss curve: {losses_log[0]:.2f} -> {losses_log[-1]:.2f} "
        f"({len(losses_log)} epoch records)",
        flush=True,
    )
    assert losses_log[-1] < losses_log[0] * 0.5, "did not learn"

    # Held-out eval through the batched map-txt path + WIDER evaluator.
    from scripts.train_at_scale import build_tree

    from jabd_tpu.eval import evaluate_wider
    from jabd_tpu.eval.run_wider import run_wider_val
    from jabd_tpu.predict import Predictor
    from tests.test_eval import _fake_gt_dir

    rngv = np.random.default_rng(1)
    val_root = os.path.join(root, "val")
    if not os.path.isdir(val_root):
        _, gt = build_tree(val_root, 32, rngv, subdir="0--Scale")
    else:
        _, gt = build_tree(
            os.path.join(root, "val2"), 32, rngv, subdir="0--Scale"
        )
        val_root = os.path.join(root, "val2")
    events = {"0--Scale": {k: [b for b in v] for k, v in gt.items()}}

    class _P:
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
    preds = run_wider_val(pred, val_root, batch_size=16)
    aps = evaluate_wider(preds, str(gt_dir), iou_thresh=0.4)
    print(json.dumps({k: round(v, 4) for k, v in aps.items()}), flush=True)
    assert aps["easy"] > 0.5, f"trained model failed held-out eval: {aps}"
    print("resume_at_scale PASSED", flush=True)


if __name__ == "__main__":
    main()
