"""Int8 serving accuracy at the VERIFICATION level on a trained
recognition checkpoint — the recognition twin of int8_ap_delta.py.

Trains the production `recognition.train.fit` loop on a synthetic
identity tree (the train_recognition_at_scale recipe), then reports
held-out 10-fold verification accuracy (the metric the reference's
ModelCheckpoint monitors, train_val.py:106-136) for each serving mode:

  bf16          - raw variables (the training dtype),
  bf16 + fold   - BN-folded (the serving default, `--fold`),
  int8          - absmax activation calibration on val samples,
  int8 + search - clip-ratio grid scored by end-to-end output error.

The throughput side lives in scripts/bench_int8.py (ir_50 1.49x,
ir_101 1.59x — BENCH_NOTES int8 table); this answers the accuracy
question a `recognition.cli verify --fold --quantize int8` user has.

    python scripts/int8_verification_delta.py [--arch ir_18]
        [--epochs 30] [--batch 64]
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
        "train_recognition_at_scale",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "train_recognition_at_scale.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ir_18")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--val-pairs", type=int, default=120)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from jabd_tpu.utils import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from jabd_tpu.models.quantize import (
        calibrate,
        quantize_variables,
        search_clip_ratio,
    )
    from jabd_tpu.recognition import build_head, build_model
    from jabd_tpu.recognition import train as RT
    from jabd_tpu.recognition.data import (
        ImageFolderDataset,
        load_five_validation_sets,
    )
    from jabd_tpu.recognition.fold import fold_ir

    at_scale = _load_at_scale()
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="int8_ver_")
    bases = at_scale.build_identity_tree(os.path.join(root, "train"), rng)
    at_scale.build_val_bundle(
        os.path.join(root, "val"), bases, rng, pairs=args.val_pairs
    )
    ds = ImageFolderDataset(os.path.join(root, "train"))
    steps_per_epoch = len(ds) // args.batch

    model = build_model(args.arch, dtype=jnp.bfloat16)
    head = build_head("adaface", class_num=ds.num_classes)
    state = RT.create_state(
        jax.random.PRNGKey(0), model, head,
        num_train_steps_hint=steps_per_epoch * args.epochs,
        lr=0.05,
        milestones=(
            steps_per_epoch * args.epochs * 2 // 3,
            steps_per_epoch * args.epochs * 9 // 10,
        ),
    )
    step = RT.make_train_step_aug(model, head)
    print(
        json.dumps(
            {
                "arch": args.arch,
                "images": len(ds),
                "classes": ds.num_classes,
                "epochs": args.epochs,
            }
        ),
        flush=True,
    )
    state = RT.fit(
        model, head, state, step, ds, args.batch, args.epochs,
        device_augment=True, seed=0,
        val_dir=os.path.join(root, "val"),
        checkpoint_dir=os.path.join(root, "ck"),
    )
    variables = {
        "params": state.params["model"],
        "batch_stats": state.batch_stats["model"],
    }

    # Calibration sample: held-out val faces through serving
    # normalization (the bundle ships them already normalized).
    sets = load_five_validation_sets(os.path.join(root, "val"))
    data0 = np.asarray(next(iter(sets.values()))[0])
    if data0.dtype == np.uint8:
        data0 = (data0.astype(np.float32) / 255.0 - 0.5) / 0.5
    sample = jnp.asarray(data0[:16])

    results = {}

    def report(tag, v, extra=None):
        out = RT.validate_5sets(model, v, os.path.join(root, "val"))
        acc = out["mean"]["val_acc"]
        rec = {"val_acc": round(acc, 4)}
        if "bf16_fold" in results:
            rec["delta_vs_fold"] = round(acc - results["bf16_fold"], 4)
        if extra:
            rec.update(extra)
        results[tag] = acc
        print(json.dumps({tag: rec}), flush=True)

    report("bf16", variables)
    folded = fold_ir(variables)
    results["bf16_fold"] = None  # placeholder so report sees the key
    del results["bf16_fold"]
    out = RT.validate_5sets(model, folded, os.path.join(root, "val"))
    results["bf16_fold"] = out["mean"]["val_acc"]
    print(
        json.dumps(
            {"bf16_fold": {"val_acc": round(results["bf16_fold"], 4)}}
        ),
        flush=True,
    )

    calib = calibrate(model, folded, [sample])
    q_abs, n = quantize_variables(folded, calib)
    report("int8_absmax", q_abs, {"quantized_sites": n})

    ratio, _ = search_clip_ratio(model, folded, calib, [sample])
    q_s, _ = quantize_variables(folded, calib, clip_ratio=ratio)
    report("int8_err_search", q_s, {"clip_ratio": ratio})

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    print("int8_verification_delta DONE", flush=True)


if __name__ == "__main__":
    main()
