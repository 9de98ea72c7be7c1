"""End-to-end training sanity THROUGH the device-augmentation path.

Builds a mini WIDER-format dataset on disk (bright squares as 'faces'),
then runs the full production device-augment pipeline: JPEG decode ->
plan building (draws + resample matrices) -> uint8 bucket upload ->
jitted [MXU resample + fused HSV -> forward -> matching -> MultiBox ->
Adam] -> fused inference. Proves the augmented step LEARNS end to end,
not just that its pixels match the host path (tests cover that).

Expected (TPU v5e, ~3 min incl. compile): recall@0.5 >= 0.9.

    python scripts/overfit_device_augment.py
"""

import functools
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs, losses, train
from jabd_tpu.data import wider as W
from jabd_tpu.data import device_augment as DA
from jabd_tpu.models import build_model
from jabd_tpu.ops import anchors as A
from jabd_tpu.predict import detect_batch

SIZE, BS, G = 128, 16, 8
BUCKET = (256, 256)


def build_dataset(root: str, n: int, rng) -> str:
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    lines = []
    for i in range(n):
        h, w = int(rng.integers(120, 220)), int(rng.integers(140, 256))
        img = np.full((h, w, 3), 30, np.uint8)
        lines.append(f"# img_{i}.jpg")
        for _ in range(int(rng.integers(1, 3))):
            s = int(rng.integers(max(24, min(h, w) // 6), min(h, w) // 2))
            x = int(rng.integers(0, w - s))
            y = int(rng.integers(0, h - s))
            img[y : y + s, x : x + s] = int(rng.uniform(150, 230))
            lm = " ".join(["-1.0 -1.0 -1.0"] * 5)
            lines.append(f"{x} {y} {s} {s} {lm} 1.0")
        Image.fromarray(img).save(
            os.path.join(root, "images", f"img_{i}.jpg"), quality=95
        )
    path = os.path.join(root, "label.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main(steps: int = 400, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    root = tempfile.mkdtemp(prefix="mini_wider_")
    label_txt = build_dataset(root, 64, rng)
    ds = W.WiderFaceDataset(label_txt, input_size=SIZE)

    mcfg = configs.get_model_config("mnet_v3_plain")
    tcfg = configs.TrainConfig(
        batch_size=BS,
        image_size=SIZE,
        max_targets=G,
        lr_freeze=1e-3,
        device_augment=True,
        augment_bucket=BUCKET,
    )
    state = train.create_train_state(
        jax.random.PRNGKey(seed), mcfg, tcfg, steps_per_epoch=10_000,
        image_size=SIZE,
    )
    step = train.make_train_step(mcfg, tcfg)
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (SIZE, SIZE)))

    it = 0
    epoch = 0
    while it < steps:
        for images_u8, plan, tgt in DA.device_train_loader(
            ds, BS, bucket_hw=BUCKET, max_targets=G, seed=seed + epoch,
        ):
            targets = losses.Targets(
                jnp.asarray(tgt[0]), jnp.asarray(tgt[1]),
                jnp.asarray(tgt[2]), jnp.asarray(tgt[3]),
            )
            plan_d = jax.tree_util.tree_map(jnp.asarray, plan)
            state, m = step(
                state, jnp.asarray(images_u8), plan_d, targets, anchors
            )
            if it % 100 == 0:
                print(f"step {it}: loss={float(m['loss']):.3f}", flush=True)
            it += 1
            if it >= steps:
                break
        epoch += 1

    # Clean (unaugmented) eval canvases.
    model = build_model(mcfg, mode="eval")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pcfg = configs.PredictConfig(
        confidence=0.5, input_shape=(SIZE, SIZE), max_detections=32,
        pre_nms_topk=64,
    )
    imgs = np.full((16, SIZE, SIZE, 3), 30.0, np.float32)
    gt_boxes = []
    for i in range(16):
        n = int(rng.integers(1, 3))
        bs_ = []
        for _ in range(n):
            s = int(rng.integers(24, 56))
            x = int(rng.integers(0, SIZE - s))
            y = int(rng.integers(0, SIZE - s))
            imgs[i, y : y + s, x : x + s] = rng.uniform(150, 230)
            bs_.append([x, y, x + s, y + s])
        gt_boxes.append(np.asarray(bs_, np.float32))
    imgs -= np.asarray([104, 117, 123], np.float32)

    dets, dvalid = detect_batch(
        functools.partial(model.apply),
        variables,
        jnp.asarray(imgs),
        anchors,
        pcfg,
        variances=mcfg.anchors.variance,
        use_pallas=jax.default_backend() == "tpu",
    )
    dets, dvalid = np.asarray(dets), np.asarray(dvalid)
    tp, total_gt, total_det = 0, 0, 0
    for i in range(16):
        gt = gt_boxes[i]
        d = dets[i][dvalid[i]]
        total_gt += len(gt)
        total_det += len(d)
        for g in gt:
            if len(d):
                xx1 = np.maximum(d[:, 0] * SIZE, g[0])
                yy1 = np.maximum(d[:, 1] * SIZE, g[1])
                xx2 = np.minimum(d[:, 2] * SIZE, g[2])
                yy2 = np.minimum(d[:, 3] * SIZE, g[3])
                inter = np.clip(xx2 - xx1, 0, None) * np.clip(
                    yy2 - yy1, 0, None
                )
                union = (
                    (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1]) * SIZE * SIZE
                    + (g[2] - g[0]) * (g[3] - g[1])
                    - inter
                )
                if (inter / np.maximum(union, 1e-9)).max() > 0.5:
                    tp += 1
    recall = tp / max(total_gt, 1)
    print(
        f"recall@0.5: {tp}/{total_gt} = {recall:.2f}; "
        f"detections: {total_det}",
        flush=True,
    )
    return recall


if __name__ == "__main__":
    assert main() >= 0.9, "device-augment training sanity failed"
    print("device-augment overfit sanity PASSED")
