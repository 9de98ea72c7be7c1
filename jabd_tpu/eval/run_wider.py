"""Batched WIDER FACE validation sweep (BASELINE config #2).

The reference evaluates one image at a time through predict.get_map_txt
(predict.py:338-415). Here the whole val set streams through the fused
batched device program: images letterbox to ONE static size on host
threads, batches of `batch_size` run decode+NMS on device (optionally
sharded over a mesh), and the letterbox-undo runs vectorized on host.
Dumps reference-format txt files and/or returns in-memory predictions for
jabd_tpu.eval.evaluate_wider.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from jabd_tpu.ops import image as I

# Sources past this are cv2-bilinear pre-shrunk before planning (same cap
# and rationale as Predictor.detect_images: detail past the letterbox
# target is lost anyway; pixel-only effect).
_SRC_CAP = 2048


def _scan_bucket(val_dir: str, items) -> Tuple[int, int]:
    """One global source bucket for the whole sweep (PIL header read, no
    decode) so the device-pyramid graph compiles ONCE."""
    from PIL import Image

    bh = bw = 1
    for event, name in items:
        with Image.open(os.path.join(val_dir, event, name)) as im:
            w, h = im.size
            # cv2.imread (the decode this bucket must fit) applies EXIF
            # orientation; PIL's raw header size does not. Orientations
            # 5-8 transpose the decoded image — swap so a rotated source
            # can't overflow pad_to_bucket's copy.
            if im.getexif().get(274, 1) in (5, 6, 7, 8):
                w, h = h, w
        bh = max(bh, min(h, _SRC_CAP))
        bw = max(bw, min(w, _SRC_CAP))
    return -(-bh // 128) * 128, -(-bw // 128) * 128


def _list_val_images(val_dir: str) -> List[Tuple[str, str]]:
    out = []
    for event in sorted(os.listdir(val_dir)):
        event_dir = os.path.join(val_dir, event)
        if not os.path.isdir(event_dir):
            continue
        for name in sorted(os.listdir(event_dir)):
            if name.lower().endswith((".jpg", ".png", ".jpeg")):
                out.append((event, name))
    return out


def run_wider_val(
    predictor,
    val_dir: str,
    batch_size: int = 32,
    out_dir: Optional[str] = None,
    num_workers: int = 8,
    multiscale: bool = False,
    scales=(0.75, 1.0, 1.25),
    pyramid: str = "host",
) -> Dict[str, Dict[str, np.ndarray]]:
    """Sweep a WIDER val tree. Returns {event: {stem: [N,5] xywh+score}}
    (the evaluator's in-memory format); optionally writes txt dumps.

    multiscale=True runs the bicubic image-pyramid variant (BASELINE
    config #5) BATCHED: each chunk makes one fused device dispatch per
    scale, then merges the scales per image and re-runs NMS on the
    union. pyramid selects where the per-scale pre-scale+letterbox
    pixels are computed:

    * "host" (default): the byte-exact two-stage cv2 recipe of
      Predictor.detect_multiscale (float32 INTER_CUBIC pre-scale,
      predict.py:403-424, then letterbox), identical detections to the
      per-image path. Txt dumps diff clean against prior runs.
    * "device": ONE uint8 source upload per image; each scale is a
      composed taps-form resample plan (ops/image.py::plan_pyramid)
      expanded and applied on the MXU — no host pre-scale (was 75
      ms/img, BENCH_NOTES round 3) and ~5-8x fewer H2D bytes. Opt-in
      acceleration, APPROXIMATE vs the host recipe: tested to <=0.05
      grey levels against the per-image path
      (tests/test_e2e_wider.py::test_plan_pyramid_matches_host_two_stage),
      and sources larger than 2048px are additionally cv2-bilinear
      pre-shrunk (_SRC_CAP) — a pre-shrink the host branch does NOT
      apply, so very large sources diverge between the modes by more
      than float association.
    """
    import cv2

    items = _list_val_images(val_dir)
    th, tw = predictor.pcfg.input_shape
    preds: Dict[str, Dict[str, np.ndarray]] = {}
    # stem -> actual filename (txt header keeps the real extension, so
    # batched dumps are byte-identical to the single-image CLI path).
    fnames = {
        (event, os.path.splitext(name)[0]): name for event, name in items
    }

    def to_rows(dets_px: np.ndarray) -> np.ndarray:
        if len(dets_px) == 0:
            return np.zeros((0, 5), np.float32)
        rows = np.stack(
            [
                dets_px[:, 0],
                dets_px[:, 1],
                dets_px[:, 2] - dets_px[:, 0],
                dets_px[:, 3] - dets_px[:, 1],
                dets_px[:, 4],
            ],
            axis=1,
        )
        return rows[np.argsort(-rows[:, 4], kind="stable")]

    if multiscale and pyramid == "device":
        import jax
        import jax.numpy as jnp

        from jabd_tpu.ops.nms import nms_numpy
        from jabd_tpu.predict import undo_letterbox_pixels

        letterbox = predictor.pcfg.letterbox
        bh, bw = _scan_bucket(val_dir, items)
        pyr_jit = jax.jit(I.pyramid_batch_device)
        pool = cf.ThreadPoolExecutor(max_workers=num_workers)

        def load_plan(item):
            event, name = item
            img = cv2.imread(os.path.join(val_dir, event, name))
            oh, ow = img.shape[:2]
            if oh > _SRC_CAP or ow > _SRC_CAP:
                r = min(_SRC_CAP / oh, _SRC_CAP / ow)
                img = cv2.resize(
                    img, (max(int(ow * r), 1), max(int(oh * r), 1))
                )
            plans = [
                I.plan_pyramid(img.shape[:2], s, (th, tw), letterbox)
                for s in scales
            ]
            return event, name, (oh, ow), I.pad_to_bucket(img, (bh, bw)), plans

        try:
            for lo in range(0, len(items), batch_size):
                chunk = items[lo : lo + batch_size]
                loaded = list(pool.map(load_plan, chunk))
                n = len(loaded)
                src = np.zeros((batch_size, bh, bw, 3), np.uint8)
                src[:n] = np.stack([p for _, _, _, p, _ in loaded])
                src_dev = jnp.asarray(src)
                merged: List[List[np.ndarray]] = [[] for _ in loaded]
                for si in range(len(scales)):
                    # Stack this scale's plans; pad rows keep all-zero
                    # weights (their frames are the constant gray fill).
                    parts = []
                    for pi in range(6):
                        shape0 = loaded[0][4][si][0][pi].shape
                        dt = loaded[0][4][si][0][pi].dtype
                        arr = np.zeros((batch_size, *shape0), dt)
                        arr[:n] = np.stack(
                            [ld[4][si][0][pi] for ld in loaded]
                        )
                        parts.append(jnp.asarray(arr))
                    frames = pyr_jit(src_dev, *parts)
                    dets_b, valid_b = predictor.detect_preprocessed(frames)
                    dets_b = np.asarray(dets_b)
                    valid_b = np.asarray(valid_b)
                    for i, (_, _, (oh, ow), _, plans) in enumerate(loaded):
                        d = dets_b[i][valid_b[i]].copy()
                        if not len(d):
                            continue
                        sh, sw = plans[si][1]
                        d = undo_letterbox_pixels(
                            d, (th, tw), (sh, sw), letterbox
                        )
                        # (sh, sw) is the pre-scale of the (possibly
                        # capped) loaded image; ow/sw folds the cap undo
                        # and the pyramid undo into one factor.
                        d[:, [0, 2]] *= ow / sw
                        d[:, [1, 3]] *= oh / sh
                        d[:, 5::2] *= ow / sw
                        d[:, 6::2] *= oh / sh
                        merged[i].append(d)
                for i, (event, name, _, _, _) in enumerate(loaded):
                    if merged[i]:
                        m = np.concatenate(merged[i], 0)
                        keep = nms_numpy(
                            m[:, :4],
                            m[:, 4],
                            iou_threshold=predictor.pcfg.nms_iou,
                        )[: predictor.pcfg.max_detections]
                        dets = m[keep]
                    else:
                        dets = np.zeros((0, 15), np.float32)
                    preds.setdefault(event, {})[
                        os.path.splitext(name)[0]
                    ] = to_rows(dets)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
    elif multiscale:
        from jabd_tpu.ops.nms import nms_numpy
        from jabd_tpu.predict import undo_letterbox_pixels

        letterbox = predictor.pcfg.letterbox
        pool = cf.ThreadPoolExecutor(max_workers=num_workers)

        def load_ms(item):
            # Pre-scale with the exact detect_multiscale recipe (float32
            # bicubic, predict.py:403-424 semantics), then letterbox each
            # scale to the shared static input — every scale rides the
            # SAME compiled graph.
            event, name = item
            img = cv2.imread(os.path.join(val_dir, event, name))
            ih, iw = img.shape[:2]
            per_scale = []
            for s in scales:
                sw = max(int(iw * s), 32)
                sh = max(int(ih * s), 32)
                scaled = cv2.resize(
                    img.astype(np.float32),
                    (sw, sh),
                    interpolation=cv2.INTER_CUBIC,
                )
                if letterbox:
                    x = I.letterbox_np(scaled, (tw, th))
                else:
                    x = cv2.resize(scaled, (tw, th)).astype(np.float32)
                per_scale.append(
                    (I.preprocess_input_np(x), (sh, sw))
                )
            return event, name, (ih, iw), per_scale

        try:
            for lo in range(0, len(items), batch_size):
                chunk = items[lo : lo + batch_size]
                loaded = list(pool.map(load_ms, chunk))
                merged: List[List[np.ndarray]] = [[] for _ in loaded]
                for si in range(len(scales)):
                    batch = np.stack(
                        [ps[si][0] for _, _, _, ps in loaded]
                    )
                    if len(batch) < batch_size:
                        pad = batch_size - len(batch)
                        batch = np.concatenate(
                            [
                                batch,
                                np.zeros(
                                    (pad, *batch.shape[1:]), batch.dtype
                                ),
                            ]
                        )
                    dets_b, valid_b = predictor.detect_preprocessed(batch)
                    dets_b = np.asarray(dets_b)
                    valid_b = np.asarray(valid_b)
                    for i, (_, _, (ih, iw), ps) in enumerate(loaded):
                        d = dets_b[i][valid_b[i]].copy()
                        if not len(d):
                            continue
                        sh, sw = ps[si][1]
                        d = undo_letterbox_pixels(
                            d, (th, tw), (sh, sw), letterbox
                        )
                        d[:, [0, 2]] *= iw / sw
                        d[:, [1, 3]] *= ih / sh
                        d[:, 5::2] *= iw / sw
                        d[:, 6::2] *= ih / sh
                        merged[i].append(d)
                for i, (event, name, _, _) in enumerate(loaded):
                    if merged[i]:
                        m = np.concatenate(merged[i], 0)
                        keep = nms_numpy(
                            m[:, :4],
                            m[:, 4],
                            iou_threshold=predictor.pcfg.nms_iou,
                        )[: predictor.pcfg.max_detections]
                        dets = m[keep]
                    else:
                        dets = np.zeros((0, 15), np.float32)
                    preds.setdefault(event, {})[
                        os.path.splitext(name)[0]
                    ] = to_rows(dets)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
    else:
        pool = cf.ThreadPoolExecutor(max_workers=num_workers)

        def load(item):
            event, name = item
            img = cv2.imread(os.path.join(val_dir, event, name))
            x = I.preprocess_input_np(
                I.letterbox_np(img, (tw, th)).astype(np.float32)
            )
            return event, name, img.shape[:2], x

        try:
            for lo in range(0, len(items), batch_size):
                chunk = items[lo : lo + batch_size]
                loaded = list(pool.map(load, chunk))
                batch = np.stack([x for _, _, _, x in loaded])
                # Pad the final partial batch to the static batch size.
                if len(batch) < batch_size:
                    pad = batch_size - len(batch)
                    batch = np.concatenate(
                        [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)]
                    )
                dets, valid = predictor.detect_preprocessed(batch)
                dets = np.asarray(dets)
                valid = np.asarray(valid)
                for i, (event, name, (ih, iw), _) in enumerate(loaded):
                    d = dets[i][valid[i]].copy()
                    if len(d):
                        (ox, oy), (sx, sy) = I.correct_boxes_scale_offset(
                            (th, tw), (ih, iw)
                        )
                        d[:, [0, 2]] = (d[:, [0, 2]] - ox) * sx * iw
                        d[:, [1, 3]] = (d[:, [1, 3]] - oy) * sy * ih
                    preds.setdefault(event, {})[
                        os.path.splitext(name)[0]
                    ] = to_rows(d)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    if out_dir:
        for event, imgs in preds.items():
            d = os.path.join(out_dir, event)
            os.makedirs(d, exist_ok=True)
            for stem, rows in imgs.items():
                fname = fnames.get((event, stem), stem + ".jpg")
                with open(os.path.join(d, stem + ".txt"), "w") as f:
                    f.write(f"{event}/{fname}\n{len(rows)}\n")
                    for r in rows:
                        f.write(
                            f"{r[0]:.3f} {r[1]:.3f} {r[2]:.3f} "
                            f"{r[3]:.3f} {r[4]:.5f}\n"
                        )
    return preds
