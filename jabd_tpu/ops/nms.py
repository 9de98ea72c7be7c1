"""Fixed-shape, jit-safe non-maximum suppression.

The reference's production path is torchvision's C++/CUDA `nms`
(`utils/utils_bbox.py:260-296`), with Python greedy ports (`nms_r` :116)
and a DIoU-NMS variant (`diounms` :182, penalty u = d^2/c^2 where d is the
center distance and c the squared diagonal of the enclosing box; a box is
suppressed when IoU - u**beta1 > overlap).

TPU constraints force a different design: no dynamic output shapes, no
data-dependent host loops. This module provides an exact-greedy NMS with
*static* shapes:

  * candidates are pre-reduced to a static K by top-k on score;
  * the greedy pass is a `lax.fori_loop` over K steps, each step an O(K)
    vectorized suppression of later boxes (identical keep-set to the
    reference's sorted greedy, including DIoU mode);
  * the output is a fixed [max_out] index set + validity mask.

`jabd_tpu.ops.nms_pallas` provides the fused Pallas kernel with the same
semantics for the hot path; this module is the reference implementation
and the CPU/test fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _suppression_row(
    box_i: jnp.ndarray,  # [4]
    boxes: jnp.ndarray,  # [K, 4] corner form
    areas: jnp.ndarray,  # [K]
    kind: str,
    beta1: float,
) -> jnp.ndarray:
    """Suppression metric of box_i against every box: IoU or DIoU."""
    x1, y1, x2, y2 = box_i[0], box_i[1], box_i[2], box_i[3]
    xx1 = jnp.maximum(boxes[:, 0], x1)
    yy1 = jnp.maximum(boxes[:, 1], y1)
    xx2 = jnp.minimum(boxes[:, 2], x2)
    yy2 = jnp.minimum(boxes[:, 3], y2)
    inter = jnp.clip(xx2 - xx1, 0.0, None) * jnp.clip(yy2 - yy1, 0.0, None)
    area_i = (x2 - x1) * (y2 - y1)
    union = areas + area_i - inter
    iou = inter / jnp.where(union > 0, union, 1.0)
    if kind == "iou":
        return iou
    if kind == "diou":
        # Mirrors utils/utils_bbox.py:229-255 exactly.
        cx_i, cy_i = (x1 + x2) / 2, (y1 + y2) / 2
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        d = (cx_i - cx) ** 2 + (cy_i - cy) ** 2
        ex1 = jnp.minimum(boxes[:, 0], x1)
        ey1 = jnp.minimum(boxes[:, 1], y1)
        ex2 = jnp.maximum(boxes[:, 2], x2)
        ey2 = jnp.maximum(boxes[:, 3], y2)
        c = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
        u = d / jnp.where(c > 0, c, 1.0)
        return iou - u**beta1
    raise ValueError(f"unknown nms kind {kind!r}")


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "kind", "beta1")
)
def nms_keep_sorted(
    boxes: jnp.ndarray,  # [K, 4] corner form, sorted by descending score
    valid: jnp.ndarray,  # [K] bool
    iou_threshold: float = 0.45,
    kind: str = "iou",
    beta1: float = 1.0,
) -> jnp.ndarray:
    """Exact greedy NMS keep mask over score-sorted candidates.

    Keep-set parity with torchvision `nms` semantics: iterate in score
    order; a kept box suppresses every later box whose metric exceeds the
    threshold. Returns [K] bool keep mask (invalid rows are never kept).
    """
    k = boxes.shape[0]
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    later = jnp.arange(k)

    def body(i, keep):
        metric = _suppression_row(boxes[i], boxes, areas, kind, beta1)
        # Suppress strictly-later boxes only if box i itself is kept.
        sup = (metric > iou_threshold) & (later > i) & keep[i]
        return keep & ~sup

    # Scores are sorted descending, so valid rows form a prefix: iterating
    # past the last valid row is a no-op. Bounding the loop by the valid
    # count turns the K-step pass into an actual-candidate-count pass
    # (typically tens after the confidence filter, vs K=thousands).
    n_valid = jnp.sum(valid.astype(jnp.int32))
    keep = jax.lax.fori_loop(0, n_valid, body, valid)
    return keep


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "kind", "beta1"),
)
def nms(
    boxes: jnp.ndarray,  # [N, 4] corner form
    scores: jnp.ndarray,  # [N]
    iou_threshold: float = 0.45,
    max_out: int = 750,
    valid: jnp.ndarray | None = None,
    kind: str = "iou",
    beta1: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with fixed output size.

    Returns (indices [max_out] into the input, keep_valid [max_out] bool),
    ordered by descending score. Invalid slots point at index 0.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]
    keep = nms_keep_sorted(sboxes, svalid, iou_threshold, kind, beta1)
    return compact_keep(keep, order, max_out)

def compact_keep(keep, order, max_out: int):
    """Compact kept entries (already in score order) into [max_out].

    Shared tail of nms() and nms_pallas(): returns (indices [max_out]
    into the ORIGINAL (pre-sort) array via `order`, valid [max_out])."""
    pos = jnp.cumsum(keep) - 1  # output slot per kept row
    in_range = keep & (pos < max_out)
    out_idx = jnp.zeros((max_out,), dtype=order.dtype)
    out_idx = out_idx.at[jnp.where(in_range, pos, max_out)].set(
        order, mode="drop"
    )
    out_valid = jnp.arange(max_out) < jnp.sum(in_range)
    return out_idx, out_valid



@functools.partial(
    jax.jit,
    static_argnames=("sigma", "score_threshold", "max_out"),
)
def soft_nms(
    boxes: jnp.ndarray,  # [N, 4] corner form
    scores: jnp.ndarray,  # [N]
    sigma: float = 0.5,
    score_threshold: float = 0.001,
    max_out: int = 750,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gaussian soft-NMS: instead of hard suppression, decay overlapping
    boxes' scores by exp(-iou^2 / sigma) and drop below score_threshold.

    The reference ships this as `softer_nms` (utils/utils_bbox.py:65-114,
    unused in the production path). Fixed-shape greedy formulation:
    iterate in (current) score order; each selection decays later boxes.

    Returns (indices [max_out], rescored [max_out], valid [max_out]).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s = jnp.where(valid, scores, NEG_INF)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def body(i, carry):
        s_cur, sel_idx, sel_score = carry
        j = jnp.argmax(s_cur)
        sj = s_cur[j]
        sel_idx = sel_idx.at[i].set(j)
        sel_score = sel_score.at[i].set(sj)
        metric = _suppression_row(boxes[j], boxes, areas, "iou", 1.0)
        decay = jnp.exp(-(metric**2) / sigma)
        s_new = s_cur * decay
        s_new = s_new.at[j].set(NEG_INF)  # selected: remove from pool
        # If the top score fell below threshold, poison the pool so later
        # iterations select nothing meaningful.
        s_new = jnp.where(sj >= score_threshold, s_new, NEG_INF)
        return s_new, sel_idx, sel_score

    k = min(max_out, n)
    init = (
        s,
        jnp.zeros((max_out,), jnp.int32),
        jnp.full((max_out,), NEG_INF),
    )
    _, sel_idx, sel_score = jax.lax.fori_loop(0, k, body, init)
    out_valid = sel_score >= score_threshold
    return sel_idx, jnp.where(out_valid, sel_score, 0.0), out_valid


def nms_numpy(
    boxes, scores, iou_threshold: float = 0.45, kind: str = "iou",
    beta1: float = 1.0,
):
    """Host-side exact greedy NMS (numpy). For small, dynamically-sized
    candidate sets (e.g. merging multi-scale pyramid detections) where a
    jitted kernel would recompile per unique N. Returns kept indices in
    score order."""
    import numpy as np

    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores)
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(boxes[:, 0], boxes[i, 0])
        yy1 = np.maximum(boxes[:, 1], boxes[i, 1])
        xx2 = np.minimum(boxes[:, 2], boxes[i, 2])
        yy2 = np.minimum(boxes[:, 3], boxes[i, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        union = areas + areas[i] - inter
        metric = inter / np.where(union > 0, union, 1)
        if kind == "diou":
            cx = (boxes[:, 0] + boxes[:, 2]) / 2
            cy = (boxes[:, 1] + boxes[:, 3]) / 2
            d = (cx - cx[i]) ** 2 + (cy - cy[i]) ** 2
            ex1 = np.minimum(boxes[:, 0], boxes[i, 0])
            ey1 = np.minimum(boxes[:, 1], boxes[i, 1])
            ex2 = np.maximum(boxes[:, 2], boxes[i, 2])
            ey2 = np.maximum(boxes[:, 3], boxes[i, 3])
            c = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
            metric = metric - (d / np.where(c > 0, c, 1)) ** beta1
        sup = metric > iou_threshold
        sup[i] = False
        suppressed |= sup
    return np.asarray(keep, dtype=np.int64)


def topk_candidates(
    boxes: jnp.ndarray,  # [N, 4]
    scores: jnp.ndarray,  # [N]
    k: int,
    score_threshold: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static top-k pre-filter (replaces the boolean `conf >= thresh` mask
    of utils/utils_bbox.py:266-267 that would create dynamic shapes).

    Returns (boxes [k, 4], scores [k], valid [k]).
    """
    masked = jnp.where(scores >= score_threshold, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, k)
    return boxes[idx], top_scores, top_scores > NEG_INF / 2
