"""Box geometry: form conversion, SSD codec, IoU family.

Pure-jnp, shape-polymorphic (works on [..., N, 4]); every function is
jit/vmap/grad-safe. Numerical semantics mirror the reference:
  * point_form / center_size      — nets/retinaface_training.py:8-17
  * intersect / jaccard           — nets/retinaface_training.py:22-59
  * encode / encode_landm         — nets/retinaface_training.py:61-84
  * decode / decode_landm         — utils/utils_bbox.py:29-46
  * iou/giou/diou/ciou matrices   — utils/box_utils.py:5-158,
                                    nets/retinaface_training_DIOU.py:339-490
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Form conversion
# ---------------------------------------------------------------------------


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    xy = boxes[..., :2]
    wh = boxes[..., 2:]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1y1 = boxes[..., :2]
    x2y2 = boxes[..., 2:]
    return jnp.concatenate([(x2y2 + x1y1) / 2, x2y2 - x1y1], axis=-1)


# ---------------------------------------------------------------------------
# Pairwise IoU matrices
# ---------------------------------------------------------------------------


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area, corner-form boxes.

    box_a: [..., A, 4], box_b: [..., B, 4] -> [..., A, B].
    """
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    inter = jnp.clip(max_xy - min_xy, 0.0, None)
    return inter[..., 0] * inter[..., 1]


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def jaccard(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU [..., A, B], corner-form boxes."""
    inter = intersect(box_a, box_b)
    area_a = area(box_a)[..., :, None]
    area_b = area(box_b)[..., None, :]
    union = area_a + area_b - inter
    return inter / union


def iou_pairwise_general(
    box_a: jnp.ndarray, box_b: jnp.ndarray, kind: str = "iou"
) -> jnp.ndarray:
    """Pairwise IoU/GIoU/DIoU/CIoU matrix [..., A, B] on corner boxes.

    Mirrors utils/box_utils.py:5-158 (bbox_overlaps_{iou,giou,diou,ciou}).
    """
    inter = intersect(box_a, box_b)
    area_a = area(box_a)[..., :, None]
    area_b = area(box_b)[..., None, :]
    union = area_a + area_b - inter
    iou = inter / union
    if kind == "iou":
        return iou

    # Enclosing box.
    enc_min = jnp.minimum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    enc_max = jnp.maximum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    enc_wh = jnp.clip(enc_max - enc_min, 0.0, None)

    if kind == "giou":
        enc_area = enc_wh[..., 0] * enc_wh[..., 1]
        return iou - (enc_area - union) / jnp.clip(enc_area, 1e-7, None)

    # Center distances.
    ctr_a = (box_a[..., :2] + box_a[..., 2:]) / 2
    ctr_b = (box_b[..., :2] + box_b[..., 2:]) / 2
    d2 = jnp.sum(
        (ctr_a[..., :, None, :] - ctr_b[..., None, :, :]) ** 2, axis=-1
    )
    c2 = jnp.sum(enc_wh**2, axis=-1)
    diou = iou - d2 / jnp.clip(c2, 1e-7, None)
    if kind == "diou":
        return diou

    if kind == "ciou":
        wh_a = (box_a[..., 2:] - box_a[..., :2])[..., :, None, :]
        wh_b = (box_b[..., 2:] - box_b[..., :2])[..., None, :, :]
        v = (4 / jnp.pi**2) * (
            jnp.arctan(wh_a[..., 0] / jnp.clip(wh_a[..., 1], 1e-7, None))
            - jnp.arctan(wh_b[..., 0] / jnp.clip(wh_b[..., 1], 1e-7, None))
        ) ** 2
        # alpha uses stop-gradient semantics in the reference (with
        # torch.no_grad()); keep it simple and stable here.
        alpha = v / jnp.clip(1 - iou + v, 1e-7, None)
        return diou - alpha * v

    raise ValueError(f"unknown iou kind {kind!r}")


def elementwise_diou(
    boxes_a: jnp.ndarray, boxes_b: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise (not pairwise) DIoU of matched corner-form box pairs.

    Used by the DIoU regression loss (retinaface_training_DIOU.py:491-522,
    which decodes predictions then computes sum(1 - DIoU) over positives).
    boxes_a, boxes_b: [..., 4] -> [...].
    """
    max_xy = jnp.minimum(boxes_a[..., 2:], boxes_b[..., 2:])
    min_xy = jnp.maximum(boxes_a[..., :2], boxes_b[..., :2])
    inter_wh = jnp.clip(max_xy - min_xy, 0.0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = area(boxes_a) + area(boxes_b) - inter
    iou = inter / jnp.clip(union, 1e-7, None)

    enc_min = jnp.minimum(boxes_a[..., :2], boxes_b[..., :2])
    enc_max = jnp.maximum(boxes_a[..., 2:], boxes_b[..., 2:])
    enc_wh = jnp.clip(enc_max - enc_min, 0.0, None)
    c2 = jnp.sum(enc_wh**2, axis=-1)
    ctr_a = (boxes_a[..., :2] + boxes_a[..., 2:]) / 2
    ctr_b = (boxes_b[..., :2] + boxes_b[..., 2:]) / 2
    d2 = jnp.sum((ctr_a - ctr_b) ** 2, axis=-1)
    return iou - d2 / jnp.clip(c2, 1e-7, None)


# ---------------------------------------------------------------------------
# SSD codec
# ---------------------------------------------------------------------------


def encode(
    matched: jnp.ndarray, priors: jnp.ndarray, variances: Tuple[float, float]
) -> jnp.ndarray:
    """Encode matched corner-form GT boxes against cxcywh priors.

    g_cxcy = ((x1y1 + x2y2)/2 - p_cxy) / (v0 * p_wh)
    g_wh   = log((x2y2 - x1y1) / p_wh) / v1
    Reference: nets/retinaface_training.py:61-70.
    """
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    # Degenerate (zero-area) boxes would give log(0) = -inf; the reference
    # never sees them only because its dataloader drops sub-pixel boxes
    # (utils/dataloader.py:143). Clamp for robustness — identical output
    # for any real box.
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-12)) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(
    loc: jnp.ndarray, priors: jnp.ndarray, variances: Tuple[float, float]
) -> jnp.ndarray:
    """Decode loc deltas against cxcywh priors into corner-form boxes.

    Reference: utils/utils_bbox.py:29-34.
    """
    cxcy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    x1y1 = cxcy - wh / 2
    x2y2 = x1y1 + wh
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def encode_landm(
    matched: jnp.ndarray, priors: jnp.ndarray, variances: Tuple[float, float]
) -> jnp.ndarray:
    """Encode [..., 10] landmark coords (5 points) against priors.

    Reference: nets/retinaface_training.py:72-84.
    """
    pts = matched.reshape(*matched.shape[:-1], 5, 2)
    p_cxy = priors[..., None, :2]
    p_wh = priors[..., None, 2:]
    g = (pts - p_cxy) / (variances[0] * p_wh)
    return g.reshape(*matched.shape[:-1], 10)


def decode_landm(
    pre: jnp.ndarray, priors: jnp.ndarray, variances: Tuple[float, float]
) -> jnp.ndarray:
    """Decode [..., 10] landmark deltas. Reference: utils/utils_bbox.py:39-46."""
    pts = pre.reshape(*pre.shape[:-1], 5, 2)
    p_cxy = priors[..., None, :2]
    p_wh = priors[..., None, 2:]
    out = p_cxy + pts * variances[0] * p_wh
    return out.reshape(*pre.shape[:-1], 10)


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable log-sum-exp over the last axis, keepdims.

    Reference: nets/retinaface_training.py:86-88 (uses the *global* max as
    the shift; the result is identical).
    """
    x_max = jnp.max(x, axis=-1, keepdims=True)
    return jnp.log(jnp.sum(jnp.exp(x - x_max), axis=-1, keepdims=True)) + x_max
