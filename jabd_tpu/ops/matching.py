"""Dense, vmap-able anchor<->ground-truth matching.

The reference matches per image on CPU inside the loss forward
(`nets/retinaface_training.py:93-162,201-214`) — the documented bottleneck
of the codebase. Here matching is a dense [G, P] computation with a padded
GT axis, vmapped over the batch, so it fuses into the jitted train step.

Exact semantics reproduced (retinaface_training.py:93-162):
  1. overlaps = jaccard(truths, point_form(priors))            [G, P]
  2. best_prior_idx[g]  = argmax_p overlaps[g]                 (per GT)
  3. best_truth_overlap[p], best_truth_idx[p] = max/argmax_g   (per prior)
  4. forced match: best_truth_overlap[best_prior_idx] = 2 and
     best_truth_idx[best_prior_idx[j]] = j  — the Python loop means the
     LAST j wins when two GTs pick the same prior; replicated via a
     max-over-gt-index reduction.
  5. conf = labels[best_truth_idx]; conf = 0 where overlap < threshold
  6. loc = encode(matched, priors), landm = encode_landm(...)

Padding: GT rows with valid=False take part in nothing — their overlaps are
masked to -1 so they never win a per-prior argmax, and their forced match
is suppressed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from jabd_tpu.ops import boxes as B


class MatchResult(NamedTuple):
    loc_t: jnp.ndarray  # [P, 4]  encoded box targets
    conf_t: jnp.ndarray  # [P]    label per prior (0 bg, else GT label 1/-1)
    landm_t: jnp.ndarray  # [P, 10] encoded landmark targets
    box_t: jnp.ndarray  # [P, 4]  raw matched corner-form GT boxes (for the
    # DIoU loss, which keeps unencoded boxes as targets —
    # retinaface_training_DIOU.py:231-232)


def match_single(
    threshold: float,
    truths: jnp.ndarray,  # [G, 4] corner-form, padded
    priors: jnp.ndarray,  # [P, 4] cxcywh
    variances: Tuple[float, float],
    labels: jnp.ndarray,  # [G] float: 1 (has landmarks) / -1 (no landmarks)
    landms: jnp.ndarray,  # [G, 10]
    valid: jnp.ndarray,  # [G] bool: GT row is real, not padding
) -> MatchResult:
    """Match one image's (padded) ground truths to all priors."""
    # Component-wise IoU (same math as boxes.jaccard on point_form(priors))
    # written so XLA fuses the whole [G, P] computation into one pass —
    # the stacked [..., 2] formulation materializes gigabyte-scale
    # intermediates at [B=34, G=128, P=29126].
    px1 = priors[:, 0] - priors[:, 2] / 2
    py1 = priors[:, 1] - priors[:, 3] / 2
    px2 = priors[:, 0] + priors[:, 2] / 2
    py2 = priors[:, 1] + priors[:, 3] / 2
    tx1, ty1, tx2, ty2 = (truths[:, i : i + 1] for i in range(4))  # [G, 1]
    iw = jnp.clip(jnp.minimum(tx2, px2[None]) - jnp.maximum(tx1, px1[None]),
                  0.0, None)
    ih = jnp.clip(jnp.minimum(ty2, py2[None]) - jnp.maximum(ty1, py1[None]),
                  0.0, None)
    inter = iw * ih  # [G, P]
    area_t = (tx2 - tx1) * (ty2 - ty1)  # [G, 1]
    area_p = ((px2 - px1) * (py2 - py1))[None]  # [1, P]
    overlaps = inter / (area_t + area_p - inter)
    # Padded GTs must never win: mask their rows to -1.
    overlaps = jnp.where(valid[:, None], overlaps, -1.0)

    # Per-GT best prior (only meaningful for valid rows).
    best_prior_idx = jnp.argmax(overlaps, axis=1)  # [G]

    # Per-prior best GT.
    best_truth_overlap = jnp.max(overlaps, axis=0)  # [P]
    best_truth_idx = jnp.argmax(overlaps, axis=0)  # [P]

    return finish_match(
        threshold,
        best_truth_overlap,
        best_truth_idx,
        best_prior_idx,
        truths,
        priors,
        variances,
        labels,
        landms,
        valid,
    )


def finish_match(
    threshold: float,
    best_truth_overlap: jnp.ndarray,  # [P]
    best_truth_idx: jnp.ndarray,  # [P]
    best_prior_idx: jnp.ndarray,  # [G]
    truths: jnp.ndarray,
    priors: jnp.ndarray,
    variances: Tuple[float, float],
    labels: jnp.ndarray,
    landms: jnp.ndarray,
    valid: jnp.ndarray,
) -> MatchResult:
    """Forced-match + threshold + encode tail, shared by the XLA and
    Pallas front halves."""
    num_gt = truths.shape[0]
    num_priors = priors.shape[0]
    # Forced best-prior match. The reference loop `for j:
    # best_truth_idx[best_prior_idx[j]] = j` lets the LAST valid j win on
    # conflicts; a scatter-max of GT indices reproduces that exactly (max
    # over duplicates == largest j == last j) with O(G) updates instead of
    # a [G, P] one-hot reduction.
    gt_ids = jnp.arange(num_gt)
    forced_gt = (
        jnp.full((num_priors,), -1, dtype=gt_ids.dtype)
        .at[best_prior_idx]
        .max(jnp.where(valid, gt_ids, -1))
    )  # [P]; -1 = not forced
    is_forced = forced_gt >= 0
    best_truth_idx = jnp.where(is_forced, forced_gt, best_truth_idx)
    best_truth_overlap = jnp.where(is_forced, 2.0, best_truth_overlap)

    # GT-row lookup as a one-hot matmul against the packed [G, 15] table
    # instead of three [P]-indexed gathers: dynamic gathers run on the
    # TPU's scalar path and dominated the whole matching stage (48 ms of
    # the 77 ms at bs=128/840^2 — scripts/bench_finish_match.py), while
    # the [P, G] @ [G, 15] form rides the MXU (5.6 ms, 8.6x). Exact: each
    # one-hot row selects a single f32 product at HIGHEST precision.
    table = jnp.concatenate(
        [truths, labels[:, None], landms], axis=1
    )  # [G, 15]
    onehot = (best_truth_idx[:, None] == gt_ids[None, :]).astype(
        jnp.float32
    )
    picked = jax.lax.dot(
        onehot, table, precision=jax.lax.Precision.HIGHEST
    )  # [P, 15]
    matches, conf, picked_lms = (
        picked[:, :4],
        picked[:, 4],
        picked[:, 5:],
    )
    conf = jnp.where(best_truth_overlap < threshold, 0.0, conf)

    loc = B.encode(matches, priors, variances)
    landm = B.encode_landm(picked_lms, priors, variances)
    # Zero out encodings for background priors so padded/below-threshold
    # rows cannot leak NaN/Inf from degenerate boxes (log of 0-width pads).
    fg = (conf != 0.0)[:, None]
    loc = jnp.where(fg, loc, 0.0)
    landm = jnp.where(fg, landm, 0.0)
    box_t = jnp.where(fg, matches, 0.0)
    return MatchResult(loc_t=loc, conf_t=conf, landm_t=landm, box_t=box_t)


def match_batch(
    threshold: float,
    truths: jnp.ndarray,  # [B, G, 4]
    priors: jnp.ndarray,  # [P, 4]
    variances: Tuple[float, float],
    labels: jnp.ndarray,  # [B, G]
    landms: jnp.ndarray,  # [B, G, 10]
    valid: jnp.ndarray,  # [B, G]
) -> MatchResult:
    """vmapped dense matching over the batch (replaces the CPU loop at
    nets/retinaface_training.py:201-214)."""
    fn = jax.vmap(
        lambda t, l, lm, v: match_single(
            threshold, t, priors, variances, l, lm, v
        )
    )
    return fn(truths, labels, landms, valid)
