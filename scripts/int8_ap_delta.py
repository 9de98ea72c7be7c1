"""Int8 serving accuracy at the AP level on a TRAINED checkpoint
(round-4 VERDICT ask #4: the int8 table's missing "AP delta" column).

Trains the production `train.fit` loop on a synthetic WIDER tree (the
train_at_scale recipe: bright squares as faces), then reports
Easy/Medium/Hard AP on a held-out synthetic val tree for each serving
mode:

  bf16            - the folded serving default,
  int8            - absmax activation calibration,
  int8 + search   - clip-ratio grid scored by end-to-end output error,
  int8 + AP search- clip-ratio grid scored by mean WIDER AP (the
                    `cli map-txt --quantize-search --gt-dir` wiring).

The AP numbers answer the question a `--quantize int8` user actually
has; the throughput side lives in scripts/bench_int8.py (BENCH_NOTES
int8 table).

    python scripts/int8_ap_delta.py [--model jabd_flagship]
        [--steps 800] [--batch 48] [--size 640]
"""

import argparse
import importlib.util
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_at_scale():
    spec = importlib.util.spec_from_file_location(
        "train_at_scale",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "train_at_scale.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="jabd_flagship")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--images", type=int, default=672)
    ap.add_argument("--val-images", type=int, default=32)
    ap.add_argument("--src-scale", type=float, default=1.0)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from jabd_tpu.utils import compile_cache

    compile_cache.enable()

    import cv2
    import jax  # noqa: F401 — initialize before fit

    from jabd_tpu import configs, train
    from jabd_tpu.data import wider as W
    from jabd_tpu.eval import evaluate_wider
    from jabd_tpu.eval.run_wider import run_wider_val
    from jabd_tpu.predict import Predictor
    from tests.test_eval import _fake_gt_dir

    at_scale = _load_at_scale()
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="int8_ap_")

    # --- train (single-phase production fit, device augment)
    label_txt, _ = at_scale.build_tree(
        root, args.images, rng, src_scale=args.src_scale
    )
    ds = W.WiderFaceDataset(label_txt, input_size=args.size)
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
    tcfg = configs.TrainConfig(
        batch_size=args.batch,
        image_size=args.size,
        max_targets=32,
        freeze_epochs=0,
        total_epochs=total_epochs,
        save_period=10**9,  # no periodic ckpts — the state is returned
        device_augment=True,
        augment_bucket=bucket,
        lr_unfreeze=1e-3,
    )
    print(
        json.dumps(
            {
                "model": args.model,
                "train_steps": steps_per_epoch * total_epochs,
                "epochs": total_epochs,
            }
        ),
        flush=True,
    )
    state = train.fit(mcfg, tcfg, ds, log_dir=os.path.join(root, "logs"))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # --- held-out val tree + GT
    rngv = np.random.default_rng(1)
    val_dir = os.path.join(root, "val")
    _, gt = at_scale.build_tree(
        val_dir, args.val_images, rngv, subdir="0--Scale",
        src_scale=args.src_scale,
    )
    events = {"0--Scale": {k: list(v) for k, v in gt.items()}}

    class _P:
        def __init__(self, p):
            self.p = p

        def __truediv__(self, other):
            return os.path.join(self.p, other)

        def __str__(self):
            return self.p

    os.makedirs(os.path.join(root, "gt"), exist_ok=True)
    gt_dir = str(_fake_gt_dir(_P(os.path.join(root, "gt")), events))

    pcfg = configs.PredictConfig(
        confidence=0.3,
        input_shape=(args.size, args.size),
        max_detections=128,
        pre_nms_topk=512,
    )

    def aps_of(pred):
        preds = run_wider_val(pred, val_dir, batch_size=16)
        return evaluate_wider(preds, gt_dir, iou_thresh=0.4)

    # calibration sample: first val images, decoded like serving input
    img_dir = os.path.join(val_dir, "0--Scale")
    sample = [
        cv2.imread(os.path.join(img_dir, n))
        for n in sorted(os.listdir(img_dir))[:8]
        if n.endswith(".jpg")
    ]

    results = {}

    def report(tag, pred, extra=None):
        aps = aps_of(pred)
        rec = {k: round(v, 4) for k, v in aps.items()}
        if "bf16" in results:
            rec["delta_vs_bf16"] = {
                k: round(aps[k] - results["bf16"][k], 4) for k in aps
            }
        if extra:
            rec.update(extra)
        results[tag] = {k: aps[k] for k in aps}
        print(json.dumps({tag: rec}), flush=True)

    report("bf16", Predictor(mcfg, variables, pcfg))

    p_abs = Predictor(mcfg, variables, pcfg)
    n = p_abs.quantize_int8(sample, search_clip=False)
    report("int8_absmax", p_abs, {"quantized_sites": n})

    p_err = Predictor(mcfg, variables, pcfg)
    p_err.quantize_int8(sample, search_clip=True)
    report("int8_err_search", p_err)

    # AP-scored search: the cli map-txt --quantize-search --gt-dir path
    p_ap = Predictor(mcfg, variables, pcfg)

    def score_fn(qvars):
        saved = p_ap.variables
        p_ap.variables = p_ap._place_variables(qvars)
        try:
            aps = aps_of(p_ap)
            s = -(aps["easy"] + aps["medium"] + aps["hard"]) / 3.0
            print(json.dumps({"ap_search_candidate": round(-s, 4)}),
                  flush=True)
            return s
        finally:
            p_ap.variables = saved

    p_ap.quantize_int8(sample, search_clip=True, score_fn=score_fn)
    report("int8_ap_search", p_ap)

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    print("int8_ap_delta DONE", flush=True)


if __name__ == "__main__":
    main()
