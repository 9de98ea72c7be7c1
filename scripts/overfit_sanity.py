"""End-to-end training sanity: overfit on synthetic detection data.

Validates the complete loop on real hardware — dense anchor matching +
MultiBox loss + hard-negative mining + Adam (bf16 compute) actually
LEARN, and the fused inference pipeline (Pallas NMS included) detects
what was learned. Expected result (TPU v5e, ~1 min): recall@0.5 = 1.00
with zero false positives after 400 steps.

    python scripts/overfit_sanity.py
"""

import functools
import os
import sys

# Runnable as `python scripts/overfit_sanity.py` without installing the
# package: sys.path[0] is scripts/, so add the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs, losses, train
from jabd_tpu.models import build_model
from jabd_tpu.ops import anchors as A
from jabd_tpu.predict import detect_batch

SIZE, BS, G = 128, 16, 4


def make_batch(rng, n):
    """Gray canvas with 1-2 bright squares as 'faces'."""
    imgs = np.full((n, SIZE, SIZE, 3), 30.0, np.float32)
    boxes = np.zeros((n, G, 4), np.float32)
    valid = np.zeros((n, G), bool)
    for i in range(n):
        for j in range(int(rng.integers(1, 3))):
            s = int(rng.integers(24, 48))
            x = int(rng.integers(0, SIZE - s))
            y = int(rng.integers(0, SIZE - s))
            imgs[i, y : y + s, x : x + s] = rng.uniform(150, 230)
            boxes[i, j] = [x / SIZE, y / SIZE, (x + s) / SIZE, (y + s) / SIZE]
            valid[i, j] = True
    imgs -= np.asarray([104, 117, 123], np.float32)
    return imgs, boxes, valid


def main(steps: int = 400, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    mcfg = configs.get_model_config("mnet_v3_plain")
    tcfg = configs.TrainConfig(
        batch_size=BS, image_size=SIZE, max_targets=G, lr_freeze=1e-3
    )
    state = train.create_train_state(
        jax.random.PRNGKey(seed), mcfg, tcfg, steps_per_epoch=10_000,
        image_size=SIZE,
    )
    step = train.make_train_step(mcfg, tcfg)
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (SIZE, SIZE)))

    for it in range(steps):
        imgs, boxes, valid = make_batch(rng, BS)
        targets = losses.Targets(
            jnp.asarray(boxes),
            jnp.ones((BS, G)),
            jnp.zeros((BS, G, 10)),
            jnp.asarray(valid),
        )
        state, m = step(state, jnp.asarray(imgs), targets, anchors)
        if it % 100 == 0:
            print(f"step {it}: loss={float(m['loss']):.3f}")

    model = build_model(mcfg, mode="eval")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pcfg = configs.PredictConfig(
        confidence=0.5, input_shape=(SIZE, SIZE), max_detections=32,
        pre_nms_topk=64,
    )
    imgs, boxes, valid = make_batch(rng, 16)
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
        gt = boxes[i][valid[i]] * SIZE
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
        f"detections: {total_det}"
    )
    return recall


if __name__ == "__main__":
    assert main() >= 0.9, "training sanity failed: recall < 0.9"
    print("overfit sanity PASSED")
