"""Generate the committed golden end-to-end regression fixture
(VERDICT r4 #5).

Trains a TINY retinaface_mnet025 checkpoint at 96^2 on synthetic
bright-square "faces" (CPU-forced, seed-pinned), writes:

  tests/fixtures/golden_e2e/ckpt_mnet025_96.npz   — f16 params +
      f32 batch_stats, flat {path: array} (a few hundred KB)
  tests/fixtures/golden_e2e/images/img_*.png      — 3 lossless
      mixed-size fixture images (PNG: byte-identical decode everywhere,
      unlike JPEG whose output is libjpeg-version-dependent)
  tests/fixtures/golden_e2e/golden.npz            — per-image [N,15]
      pixel detections + counts, the synthetic GT boxes, and the
      Easy/Medium/Hard AP of the dump through eval/wider_eval.py

tests/test_golden_e2e.py then re-runs preprocess -> forward -> decode ->
NMS -> AP from the committed checkpoint on the committed PNGs every
round (<30 s, CPU) and pins the outputs against the goldens — the
drift alarm every prior round lacked (all numeric claims used to be
re-derived per round, tunnel-weather sensitive).

    python scripts/make_golden_fixture.py
"""

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

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "golden_e2e",
)
SIZE, BS, G, STEPS, SEED = 96, 8, 4, 700, 0


def make_batch(rng, n):
    """Textured canvas with 1-2 bright squares as 'faces' (the
    overfit_sanity recipe at SIZE=96)."""
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


def fixture_images(rng):
    """3 deterministic mixed-size uint8 BGR images with square 'faces'
    (mixed sizes exercise letterbox + correct_boxes undo)."""
    sizes = [(96, 128), (120, 80), (64, 64)]
    out = {}
    gt = {}
    for i, (h, w) in enumerate(sizes):
        img = np.full((h, w, 3), 30, np.uint8)
        img = img + rng.integers(0, 12, (h, w, 3)).astype(np.uint8)
        boxes = []
        for j in range(2 + i % 2):
            # faces >= 24 src px: after the worst letterbox (128 -> 96,
            # scale 0.75) they stay >= 18 input px — inside the training
            # distribution (16-40 px at 96^2) and the anchor coverage
            s = int(rng.integers(24, max(25, min(h, w) // 2)))
            x = int(rng.integers(0, w - s))
            y = int(rng.integers(0, h - s))
            img[y : y + s, x : x + s] = int(rng.uniform(150, 230))
            boxes.append([x, y, s, s])  # xywh, evaluator convention
        out[f"img_{i}"] = img
        gt[f"img_{i}"] = np.asarray(boxes, np.float32)
    return out, gt


def main():
    import cv2

    from jabd_tpu.models import build_model
    from jabd_tpu.predict import Predictor
    from jabd_tpu.utils import compile_cache

    compile_cache.enable(allow_cpu=True)
    rng = np.random.default_rng(SEED)
    mcfg = configs.get_model_config("retinaface_mnet025")
    import dataclasses

    mcfg = dataclasses.replace(mcfg, compute_dtype="float32")
    tcfg = configs.TrainConfig(
        batch_size=BS, image_size=SIZE, max_targets=G, lr_freeze=1e-3
    )
    state = train.create_train_state(
        jax.random.PRNGKey(SEED), mcfg, tcfg, steps_per_epoch=10_000,
        image_size=SIZE,
    )
    step = train.make_train_step(mcfg, tcfg)
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (SIZE, SIZE)))
    for it in range(STEPS):
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

    os.makedirs(os.path.join(FIXTURE_DIR, "images"), exist_ok=True)

    # --- checkpoint: f16 params (halves the committed bytes; the test
    # loads THESE f16-rounded values, so goldens and test agree exactly)
    from jabd_tpu.utils.np_ckpt import save_variables_npz

    save_variables_npz(
        os.path.join(FIXTURE_DIR, "ckpt_mnet025_96.npz"),
        {"params": state.params, "batch_stats": state.batch_stats},
        params_dtype=np.float16,
    )

    # --- fixture images
    imgs, gt = fixture_images(np.random.default_rng(SEED + 1))
    for name, img in imgs.items():
        assert cv2.imwrite(
            os.path.join(FIXTURE_DIR, "images", name + ".png"), img
        )

    # --- golden outputs through the production CPU inference path,
    # from the f16-rounded values the committed checkpoint holds
    from jabd_tpu.utils.np_ckpt import load_variables_npz

    model = build_model(mcfg, mode="eval")
    template = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0),
        jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
    )
    variables = load_variables_npz(
        os.path.join(FIXTURE_DIR, "ckpt_mnet025_96.npz"), template
    )
    pcfg = configs.PredictConfig(
        confidence=0.5,
        nms_iou=0.3,
        input_shape=(SIZE, SIZE),
        max_detections=32,
        pre_nms_topk=64,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False, fold_bn=False)
    golden = {}
    total = 0
    for name, img in imgs.items():
        d = pred.detect_image(img.astype(np.float32))
        golden[f"dets_{name}"] = np.asarray(d, np.float32)
        golden[f"gt_{name}"] = gt[name]
        total += len(d)
        print(f"{name}: {len(d)} detections", flush=True)
    assert total >= 5, f"trained fixture detects too little ({total})"

    # --- AP of the dump (the test recomputes and pins it)
    from jabd_tpu.eval import evaluate_wider
    from tests.test_golden_e2e import dump_and_eval

    aps = dump_and_eval(golden, evaluate_wider)
    print("APs:", aps, flush=True)
    assert all(0.0 < v <= 1.0 for v in aps.values()), aps
    golden["aps"] = np.asarray(
        [aps["easy"], aps["medium"], aps["hard"]], np.float64
    )
    np.savez_compressed(os.path.join(FIXTURE_DIR, "golden.npz"), **golden)
    print("golden fixture written to", FIXTURE_DIR, flush=True)


if __name__ == "__main__":
    main()
