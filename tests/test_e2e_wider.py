"""End-to-end WIDER pipeline integration: images -> Predictor ->
map-txt dumps -> official evaluator over fabricated .mat ground truth
(SURVEY.md section 4's planned "end-to-end WIDER-protocol test on a tiny
synthetic event tree")."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jabd_tpu import configs
from jabd_tpu.eval import evaluate_wider
from jabd_tpu.models import build_model
from jabd_tpu.predict import Predictor
from tests.test_eval import _fake_gt_dir

pytestmark = pytest.mark.slow  # compile-heavy module



@pytest.mark.slow
def test_map_txt_to_evaluation(tmp_path, rng):
    import cv2

    # Tiny val tree: 1 event, 2 images.
    events = {"0--Parade": {}}
    val_dir = tmp_path / "val" / "0--Parade"
    val_dir.mkdir(parents=True)
    gt = {}
    for i in range(2):
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        cv2.imwrite(str(val_dir / f"img_{i}.jpg"), img)
        gt[f"img_{i}"] = [[20, 20, 30, 30]]
    events["0--Parade"] = gt
    gt_dir = _fake_gt_dir(tmp_path, events)

    mcfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    pcfg = configs.PredictConfig(
        confidence=0.02,
        input_shape=(64, 64),
        max_detections=64,
        pre_nms_topk=128,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False)

    # map-txt dump in the reference layout (predict.py get_map_txt +
    # evaluator-consumed txt files).
    out_dir = tmp_path / "preds"
    for event in os.listdir(tmp_path / "val"):
        (out_dir / event).mkdir(parents=True)
        for name in os.listdir(tmp_path / "val" / event):
            img = cv2.imread(str(tmp_path / "val" / event / name))
            rows = pred.get_map_txt_rows(img)
            stem = os.path.splitext(name)[0]
            with open(out_dir / event / (stem + ".txt"), "w") as f:
                f.write(f"{event}/{name}\n{len(rows)}\n")
                for r in rows:
                    f.write(
                        f"{r[0]:.3f} {r[1]:.3f} {r[2]:.3f} {r[3]:.3f} "
                        f"{r[4]:.5f}\n"
                    )

    aps = evaluate_wider(str(out_dir), gt_dir, iou_thresh=0.4)
    # Random weights: AP is arbitrary but the protocol must produce a
    # finite value in [0, 1] for every setting.
    for s in ("easy", "medium", "hard"):
        assert 0.0 <= aps[s] <= 1.0


@pytest.mark.slow
def test_cli_map_txt_batched_matches_single(tmp_path, rng):
    """`cli map-txt --batch-size 2` must produce byte-identical txt dumps
    to the single-image path (VERDICT r2 ask #3: BASELINE config #2
    reachable from the command line)."""
    import cv2

    from jabd_tpu import cli

    val_dir = tmp_path / "val" / "0--Parade"
    val_dir.mkdir(parents=True)
    for i in range(3):  # odd count: exercises the partial final batch
        img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
        cv2.imwrite(str(val_dir / f"img_{i}.jpg"), img)

    base = [
        "map-txt", "--model", "mnet_v3_plain", "--val-dir",
        str(tmp_path / "val"), "--input-size", "64",
        "--confidence", "0.02",
    ]
    cli.main(base + ["--out", str(tmp_path / "single")])
    cli.main(base + ["--out", str(tmp_path / "batched"), "--batch-size", "2"])

    single = sorted((tmp_path / "single" / "0--Parade").iterdir())
    batched = sorted((tmp_path / "batched" / "0--Parade").iterdir())
    assert [p.name for p in single] == [p.name for p in batched] and single
    for s, b in zip(single, batched):
        assert s.read_text() == b.read_text(), s.name


@pytest.mark.slow
def test_cli_map_txt_multiscale_smoke(tmp_path, rng):
    """--multiscale routes through the image-pyramid sweep and dumps the
    evaluator-consumable layout (BASELINE config #5 via the CLI)."""
    import cv2

    from jabd_tpu import cli

    val_dir = tmp_path / "val" / "0--Parade"
    val_dir.mkdir(parents=True)
    cv2.imwrite(
        str(val_dir / "img_0.jpg"),
        rng.integers(0, 255, (80, 100, 3), dtype=np.uint8),
    )
    cli.main([
        "map-txt", "--model", "mnet_v3_plain", "--val-dir",
        str(tmp_path / "val"), "--input-size", "64", "--confidence",
        "0.02", "--out", str(tmp_path / "ms"), "--multiscale",
    ])
    txt = (tmp_path / "ms" / "0--Parade" / "img_0.txt").read_text()
    assert txt.startswith("0--Parade/img_0.jpg\n")


@pytest.mark.slow
@pytest.mark.parametrize("pyramid", ["host", "device"])
def test_multiscale_sweep_matches_per_image(tmp_path, rng, pyramid):
    """The BATCHED multiscale sweep (one device dispatch per scale per
    chunk) must reproduce the per-image Predictor.detect_multiscale
    detections — pyramid="host" runs the identical two-stage cv2
    sequence; pyramid="device" runs the composed on-device plans
    (ops/image.py::plan_pyramid), exact up to f32 association, so the
    keep-set and coordinates must still agree within float tolerance."""
    import cv2

    from jabd_tpu.eval.run_wider import run_wider_val

    val_dir = tmp_path / "val" / "0--Parade"
    val_dir.mkdir(parents=True)
    imgs = {}
    for i in range(3):  # odd count exercises the padded final chunk
        img = rng.integers(0, 255, (80 + 8 * i, 100, 3), dtype=np.uint8)
        cv2.imwrite(str(val_dir / f"img_{i}.jpg"), img)
        imgs[f"img_{i}"] = str(val_dir / f"img_{i}.jpg")

    mcfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    pcfg = configs.PredictConfig(
        confidence=0.02, input_shape=(64, 64), max_detections=32,
        pre_nms_topk=64,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False)
    scales = (0.75, 1.0)

    preds = run_wider_val(
        pred, str(tmp_path / "val"), batch_size=2, multiscale=True,
        scales=scales, pyramid=pyramid,
    )["0--Parade"]

    for stem, path in imgs.items():
        d = pred.detect_multiscale(cv2.imread(path), scales=scales)
        rows = np.stack(
            [d[:, 0], d[:, 1], d[:, 2] - d[:, 0], d[:, 3] - d[:, 1],
             d[:, 4]], axis=1,
        ) if len(d) else np.zeros((0, 5), np.float32)
        rows = rows[np.argsort(-rows[:, 4], kind="stable")]
        # bs=1 vs batched graphs tile the (default-bf16) matmuls
        # differently -> ~1e-4 rel coordinate wobble; the sequence
        # (resize/letterbox/merge/NMS keep-set) must match exactly.
        assert preds[stem].shape == rows.shape, stem
        np.testing.assert_allclose(
            preds[stem], rows, rtol=1e-3, atol=1e-2, err_msg=stem
        )
        assert len(rows), stem  # non-vacuous: random weights at 0.02 fire


def test_scan_bucket_exif_orientation(tmp_path):
    """An EXIF-rotated source (orientation 6) decodes TRANSPOSED under
    cv2.imread (which applies EXIF) while PIL's raw header size doesn't
    rotate — the bucket scan must fit the cv2-decoded shape or
    pad_to_bucket's copy overflows and kills the device-pyramid sweep
    (ADVICE r3 #1)."""
    import cv2
    from PIL import Image

    from jabd_tpu.eval.run_wider import _scan_bucket
    from jabd_tpu.ops.image import pad_to_bucket

    val_dir = tmp_path / "0--Parade"
    val_dir.mkdir(parents=True)
    im = Image.new("RGB", (300, 100))  # raw header: w=300, h=100
    exif = im.getexif()
    exif[274] = 6  # rotate 90 CW on decode -> 100w x 300h
    path = val_dir / "rot.jpg"
    im.save(str(path), exif=exif)

    decoded = cv2.imread(str(path))
    assert decoded.shape[:2] == (300, 100)  # cv2 applied the EXIF

    bh, bw = _scan_bucket(str(tmp_path), [("0--Parade", "rot.jpg")])
    assert bh >= decoded.shape[0] and bw >= decoded.shape[1]
    pad_to_bucket(decoded, (bh, bw))  # must not raise


@pytest.mark.slow
def test_batched_val_sweep(tmp_path, rng):
    """run_wider_val: batched sweep produces the same prediction structure
    as the per-image path and feeds the evaluator."""
    import cv2

    from jabd_tpu.eval.run_wider import run_wider_val

    val_dir = tmp_path / "val"
    gt = {}
    for event in ("0--Parade", "1--Handshaking"):
        (val_dir / event).mkdir(parents=True)
        gt[event] = {}
        for i in range(3):
            img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
            cv2.imwrite(str(val_dir / event / f"img_{i}.jpg"), img)
            gt[event][f"img_{i}"] = [[10, 10, 20, 20]]
    gt_dir = _fake_gt_dir(tmp_path, gt)

    mcfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    pcfg = configs.PredictConfig(
        confidence=0.02, input_shape=(64, 64), max_detections=32,
        pre_nms_topk=64,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False)
    preds = run_wider_val(
        pred, str(val_dir), batch_size=4, out_dir=str(tmp_path / "dump")
    )
    assert set(preds) == {"0--Parade", "1--Handshaking"}
    assert all(len(v) == 3 for v in preds.values())
    # txt dumps parse back identically
    from jabd_tpu.eval.wider_eval import load_pred_dir

    loaded = load_pred_dir(str(tmp_path / "dump"))
    assert set(loaded) == set(preds)
    aps = evaluate_wider(preds, gt_dir)
    assert all(0.0 <= v <= 1.0 for v in aps.values())
