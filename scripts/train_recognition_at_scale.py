"""Recognition train-at-scale proof on the real TPU.

The recognition twin of scripts/train_at_scale.py: runs the PRODUCTION
`recognition.train.fit` loop — the Lightning-Trainer surface rebuilt on
the TPU stack — over a synthetic identity tree for hundreds of steps,
exercising together what the unit tests only approximate:

  * Orbax epoch checkpoints incl. optimizer state + AUTO-RESUME
    mid-recipe (fit is invoked twice: phase A stops at the midpoint,
    phase B gets the full epoch budget and must pick up, not restart);
  * the best-on-val_acc copy + metrics.csv artifacts
    (ModelCheckpoint(monitor='val_acc') / CSVLogger, main.py:26-33);
  * per-epoch 5-set-format flip-TTA validation on held-out pairs
    (train_val.py:106-136) — the val bundle here is synthetic but uses
    the production memfile format and the production 10-fold evaluator;
  * optional --device-augment (the AdaFace recipe fused into the step)
    and --shard-head (PartialFC-style class sharding) paths;
  * bounded dispatch run-ahead across hundreds of donated-state steps.

Pass criteria: phase B resumed (its log contains only post-interrupt
epochs), final train acc ≈ 1, and held-out verification val_acc > 0.9
on fresh (unseen-jitter) renders.

    python scripts/train_recognition_at_scale.py [--epochs 40]
    python scripts/train_recognition_at_scale.py --device-augment
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IDS, PER_ID, SIZE = 32, 24, 112  # overridable via --ids/--per-id


def identity_base(identity: int) -> np.ndarray:
    """Deterministic per-identity 'face': a smooth low-frequency pattern
    (8x8 random grid upsampled 14x), distinct per identity."""
    r = np.random.default_rng(1000 + identity)
    coarse = r.uniform(40, 215, (8, 8, 3)).astype(np.float32)
    return np.kron(coarse, np.ones((14, 14, 1), np.float32))


def render(base: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """One 'photo': brightness/contrast jitter, small translation, pixel
    noise, random flip — nuisance variability the head can't memorize."""
    img = base * rng.uniform(0.8, 1.2) + rng.uniform(-20, 20)
    dx, dy = rng.integers(-8, 9, size=2)
    img = np.roll(img, (dy, dx), axis=(0, 1))
    img = img + rng.normal(0, 8, img.shape)
    if rng.random() < 0.5:
        img = img[:, ::-1]
    return np.clip(img, 0, 255).astype(np.uint8)


def build_identity_tree(root: str, rng) -> list:
    """ImageFolderDataset-format tree: root/<id>/<k>.jpg."""
    from PIL import Image

    bases = [identity_base(i) for i in range(IDS)]
    for i, base in enumerate(bases):
        d = os.path.join(root, f"id_{i:03d}")
        os.makedirs(d, exist_ok=True)
        for k in range(PER_ID):
            Image.fromarray(render(base, rng)).save(
                os.path.join(d, f"{k}.jpg"), quality=95
            )
    return bases


def build_val_bundle(root: str, bases, rng, pairs: int = 120):
    """Held-out verification pairs in the production memfile format
    (evaluate_utils.py:28-57 layout: {name}/memfile/{name}.npy pairs
    tensor + {name}_list.npy issame): genuine = two fresh renders of the
    same identity, impostor = renders of two identities. 'lfw' name so
    load_five_validation_sets picks it up as a partial bundle."""
    n = 2 * pairs
    data = np.zeros((2 * n, SIZE, SIZE, 3), np.uint8)
    issame = np.zeros(n, bool)
    for p in range(n):
        if p % 2 == 0:  # genuine
            i = int(rng.integers(0, IDS))
            a, b = render(bases[i], rng), render(bases[i], rng)
            issame[p] = True
        else:  # impostor
            i, j = rng.choice(IDS, size=2, replace=False)
            a, b = render(bases[int(i)], rng), render(bases[int(j)], rng)
        data[2 * p], data[2 * p + 1] = a, b
    os.makedirs(os.path.join(root, "lfw", "memfile"), exist_ok=True)
    np.save(os.path.join(root, "lfw", "memfile", "lfw.npy"), data)
    np.save(os.path.join(root, "lfw_list.npy"), issame)


def main():
    global IDS, PER_ID
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--arch", default="ir_18")
    ap.add_argument("--device-augment", action="store_true")
    ap.add_argument("--shard-head", action="store_true")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument("--ids", type=int, default=IDS)
    ap.add_argument("--per-id", type=int, default=PER_ID)
    ap.add_argument("--val-pairs", type=int, default=120)
    ap.add_argument(
        "--root", default="",
        help="fixed artifact dir (reusable: a killed run resumes from "
        "its checkpoints on the next invocation — crash recovery from "
        "a fresh process)",
    )
    args = ap.parse_args()
    IDS, PER_ID = args.ids, args.per_id

    if args.force_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from jabd_tpu.recognition import build_head, build_model
    from jabd_tpu.recognition import train as RT
    from jabd_tpu.recognition.data import ImageFolderDataset
    from jabd_tpu.utils import compile_cache

    compile_cache.enable()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    root = args.root or tempfile.mkdtemp(prefix="scale_rec_")
    print(json.dumps({"artifact_root": root}), flush=True)
    if not os.path.exists(os.path.join(root, "val", "lfw_list.npy")):
        bases = build_identity_tree(os.path.join(root, "train"), rng)
        build_val_bundle(os.path.join(root, "val"), bases, rng,
                         pairs=args.val_pairs)
    ds = ImageFolderDataset(os.path.join(root, "train"))
    ckdir = os.path.join(root, "ck")

    steps_per_epoch = len(ds) // args.batch
    total, mid = args.epochs, args.epochs // 2
    print(
        json.dumps(
            {
                "images": len(ds),
                "classes": ds.num_classes,
                "steps_per_epoch": steps_per_epoch,
                "epochs": total,
                "interrupt_at": mid,
            }
        ),
        flush=True,
    )

    model = build_model(args.arch, dtype=jnp.bfloat16)

    def setup(epochs_hint):
        head = build_head(
            "adaface",
            class_num=ds.num_classes,
            pad_to=len(jax.devices()) if args.shard_head else 0,
        )
        state = RT.create_state(
            jax.random.PRNGKey(0), model, head,
            num_train_steps_hint=steps_per_epoch * epochs_hint,
            lr=0.05,
            milestones=(
                steps_per_epoch * total * 2 // 3,
                steps_per_epoch * total * 9 // 10,
            ),
        )
        if args.shard_head:
            from jabd_tpu.parallel.mesh import make_mesh
            from jabd_tpu.recognition.parallel import (
                make_sharded_train_step,
                make_sharded_train_step_aug,
            )

            mesh = make_mesh()
            mk = (
                make_sharded_train_step_aug
                if args.device_augment
                else make_sharded_train_step
            )
            step, state = mk(model, head, state, mesh)
        elif args.device_augment:
            step = RT.make_train_step_aug(model, head)
        else:
            step = RT.make_train_step(model, head)
        return head, state, step

    # --- Phase A: to the midpoint, then stop (simulated interrupt at an
    # epoch boundary; the checkpoint there carries the SGD momentum).
    logs_a, logs_b = [], []

    def log_a(m):
        logs_a.append(str(m))
        print(m, flush=True)

    def log_b(m):
        logs_b.append(str(m))
        print(m, flush=True)

    head, state, step = setup(mid)
    t0 = time.time()
    RT.fit(
        model, head, state, step, ds, args.batch, mid,
        device_augment=args.device_augment, seed=0,
        val_dir=os.path.join(root, "val"), checkpoint_dir=ckdir,
        log=log_a,
    )
    print(f"phase A done: {mid} epochs in {time.time() - t0:.0f}s",
          flush=True)

    # --- Phase B: fresh state + fit() with the FULL budget — must
    # auto-resume from the phase-A checkpoint, not restart.
    head, state, step = setup(total)
    t0 = time.time()
    state = RT.fit(
        model, head, state, step, ds, args.batch, total,
        device_augment=args.device_augment, seed=0,
        val_dir=os.path.join(root, "val"), checkpoint_dir=ckdir,
        log=log_b,
    )
    t_b = time.time() - t0
    print(f"phase B done in {t_b:.0f}s, state.step={int(state.step)}",
          flush=True)

    assert any(
        f"resumed from checkpoint at epoch {mid}" in m for m in logs_b
    ), "phase B did not auto-resume"
    b_epochs = sum("loss=" in m for m in logs_b)
    assert b_epochs == total - mid, ("resume restarted?", b_epochs)
    assert int(state.step) == steps_per_epoch * total

    rows = open(os.path.join(ckdir, "metrics.csv")).read().splitlines()
    assert len(rows) == total + 1, ("metrics.csv rows", len(rows))
    last = rows[-1].split(",")
    final_acc, final_val = float(last[3]), float(last[4])
    best = json.load(open(os.path.join(ckdir, "best_meta.json")))
    print(
        json.dumps(
            {
                "final_train_acc": final_acc,
                "final_val_acc": final_val,
                "best": best,
                "e2e_img_per_sec_phaseB": round(
                    (total - mid) * steps_per_epoch * args.batch / t_b, 1
                ),
            }
        ),
        flush=True,
    )
    smoke = args.epochs <= 4  # tiny runs check plumbing, not learning
    # Train acc is measured on AUGMENTED samples through the MARGIN
    # logits (AdaFace suppresses the target logit by design), so it
    # plateaus well below 1.0 on hard draws — the learning proof is the
    # held-out verification accuracy on fresh renders.
    assert smoke or final_acc > 0.85, f"train acc {final_acc}"
    assert smoke or best["val_acc"] > 0.9, f"held-out val_acc {best}"

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    print("train_recognition_at_scale PASSED", flush=True)


if __name__ == "__main__":
    main()
