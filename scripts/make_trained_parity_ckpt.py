"""Generate the committed TRAINED checkpoint for the trained-weights
pipeline-parity test (VERDICT r4 ask #3, second assembly).

Same recipe as scripts/make_golden_fixture.py (bright-square synthetic
faces, CPU-forced, seed-pinned) but for the `retinaface_r` preset — the
module-form JABD assembly (reference nets/retinaface_r.py) whose torch
twin the parity test loads. 1.32M params -> ~2.6 MB f16 npz.

Writes tests/fixtures/trained_parity/ckpt_retinaface_r_96.npz and
prints the final loss + a detection sanity count at the 1280^2 parity
operating point. Regenerate only after an intended training-path
change; commit the diff with the reason.

    python scripts/make_trained_parity_ckpt.py [--steps 700]
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from jabd_tpu import configs, losses, train  # noqa: E402
from jabd_tpu.ops import anchors as A  # noqa: E402

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "trained_parity",
    "ckpt_retinaface_r_96.npz",
)
SIZE, BS, G, SEED = 96, 8, 4, 0


def make_batch(rng, n):
    """make_golden_fixture.make_batch at SIZE=96 (textured canvas,
    1-2 bright squares as faces, reference mean subtracted)."""
    imgs = np.full((n, SIZE, SIZE, 3), 30.0, np.float32)
    imgs += rng.uniform(0, 12, (n, SIZE, SIZE, 3)).astype(np.float32)
    boxes = np.zeros((n, G, 4), np.float32)
    valid = np.zeros((n, G), bool)
    for i in range(n):
        for j in range(int(rng.integers(1, 3))):
            s = int(rng.integers(16, 40))
            x = int(rng.integers(0, SIZE - s))
            y = int(rng.integers(0, SIZE - s))
            imgs[i, y : y + s, x : x + s] = rng.uniform(150, 230)
            boxes[i, j] = [x / SIZE, y / SIZE, (x + s) / SIZE, (y + s) / SIZE]
            valid[i, j] = True
    imgs -= np.asarray([104, 117, 123], np.float32)
    return imgs, boxes, valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=700)
    args = ap.parse_args()

    import dataclasses

    from jabd_tpu.utils import compile_cache
    from jabd_tpu.utils.np_ckpt import save_variables_npz

    compile_cache.enable(allow_cpu=True)
    rng = np.random.default_rng(SEED)
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_r"), compute_dtype="float32"
    )
    tcfg = configs.TrainConfig(
        batch_size=BS, image_size=SIZE, max_targets=G, lr_freeze=1e-3
    )
    state = train.create_train_state(
        jax.random.PRNGKey(SEED), mcfg, tcfg, steps_per_epoch=10_000,
        image_size=SIZE,
    )
    step = train.make_train_step(mcfg, tcfg)
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (SIZE, SIZE)))
    for it in range(args.steps):
        imgs, boxes, valid = make_batch(rng, BS)
        targets = losses.Targets(
            jnp.asarray(boxes),
            jnp.ones((BS, G)),
            jnp.zeros((BS, G, 10)),
            jnp.asarray(valid),
        )
        state, m = step(state, jnp.asarray(imgs), targets, anchors)
        if it % 50 == 0:
            print(f"step {it}: loss={float(m['loss']):.3f}", flush=True)

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    save_variables_npz(
        FIXTURE,
        {"params": state.params, "batch_stats": state.batch_stats},
        params_dtype=np.float16,
    )
    print("wrote", FIXTURE, flush=True)

    # sanity: the trained detector fires at the 1280^2 parity operating
    # point (trained-scale faces survive letterbox at these source sizes)
    from tests.test_pipeline_parity_trained import (
        load_trained_variables,
        parity_images,
    )

    mcfg2, variables = load_trained_variables("retinaface_r")
    from jabd_tpu.predict import Predictor

    pcfg = configs.PredictConfig(
        confidence=0.5,
        nms_iou=0.3,
        input_shape=(1280, 1280),
        max_detections=4096,
        pre_nms_topk=16384,
    )
    pred = Predictor(mcfg2, variables, pcfg, use_pallas=False, fold_bn=False)
    for stem, (img, gt) in parity_images(2).items():
        d = pred.detect_image(img.astype(np.float32))
        print(f"{stem}: {len(d)} detections, {len(gt)} gt", flush=True)


if __name__ == "__main__":
    main()
