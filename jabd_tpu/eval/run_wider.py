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
) -> Dict[str, Dict[str, np.ndarray]]:
    """Sweep a WIDER val tree. Returns {event: {stem: [N,5] xywh+score}}
    (the evaluator's in-memory format); optionally writes txt dumps.

    multiscale=True runs the bicubic image-pyramid variant (BASELINE
    config #5) through Predictor.detect_multiscale per image (slower,
    host-driven); the default path is the fully batched single-scale
    sweep.
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

    if multiscale:
        for event, name in items:
            img = cv2.imread(os.path.join(val_dir, event, name))
            dets = predictor.detect_multiscale(img, scales=scales)
            preds.setdefault(event, {})[os.path.splitext(name)[0]] = (
                to_rows(dets)
            )
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
