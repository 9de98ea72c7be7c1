"""MultiBox loss with dense matching and sort-based hard-negative mining.

TPU-native re-design of `nets/retinaface_training.py:165-303`
(MultiBoxLoss) and the DIoU variant `nets/retinaface_training_DIOU.py`
(:491-522 IouLoss, :524-612 MultiBoxLoss with match_iou): no per-image
CPU loop, no boolean indexing — everything is dense masked arithmetic
vmapped over the batch, fully inside jit.

Semantics reproduced exactly:
  * landmark smooth-L1 over priors with conf_t > 0 (label 1: has
    landmarks), box smooth-L1 over conf_t != 0 (labels 1 and -1)
    (:236-249);
  * hard-negative mining: per-prior ranking loss
    log_sum_exp(conf) - conf[label_t], zeroed at positives, double-argsort
    rank, negatives = rank < min(7 * num_pos, P - 1) (:261-280);
  * cross-entropy over positives (target 1) + mined negatives (target 0),
    summed, normalized by total positives N = max(sum pos, 1); landmark
    loss normalized by N1 = max(sum pos1, 1) (:293-302);
  * total objective (train scripts): loc_weight * loss_l + loss_c +
    loss_landm (train_mobilenetV3_ecagai.py:530).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from jabd_tpu.ops import boxes as B
from jabd_tpu.ops import matching


class Targets(NamedTuple):
    """Padded per-image ground truth (built by the data pipeline from the
    reference's [N, 15] annotation rows: 4 box + 10 landmark + flag)."""

    boxes: jnp.ndarray  # [B, G, 4] normalized corner form
    labels: jnp.ndarray  # [B, G] 1.0 (landmarks) / -1.0 (no landmarks)
    landms: jnp.ndarray  # [B, G, 10]
    valid: jnp.ndarray  # [B, G] bool


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (torch beta=1): 0.5x^2 if |x|<1 else |x|-0.5."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


@functools.partial(
    jax.jit,
    static_argnames=(
        "overlap_threshold",
        "neg_pos_ratio",
        "variances",
        "box_loss",
        "matching_impl",
        "matching_mesh",
    ),
)
def multibox_loss(
    predictions: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    priors: jnp.ndarray,  # [P, 4] cxcywh
    targets: Targets,
    overlap_threshold: float = 0.35,
    neg_pos_ratio: int = 7,
    variances: Tuple[float, float] = (0.1, 0.2),
    box_loss: str = "smooth_l1",  # or 'diou'
    matching_impl: str = "auto",  # 'auto'|'xla'|'pallas'|'pallas_interpret'
    matching_mesh=None,  # jax.sharding.Mesh when the step runs SPMD
) -> Dict[str, jnp.ndarray]:
    """Returns dict(loss_l, loss_c, loss_landm) — the three normalized
    terms the train scripts combine as loc_weight*l + c + landm.

    `matching_mesh`: the mesh a multi-device train step shards its batch
    over. The Pallas matching kernel is an opaque custom call GSPMD
    cannot partition (the same reason SERVING runs its Pallas NMS under
    shard_map — predict.py::_sharded_detect_fn); with a >1-device mesh
    the kernel therefore runs per-shard via shard_map over the batch
    axis. Matching consumes only targets + priors (never params), so
    gradients don't flow through the wrapped region. The XLA matching
    path needs no wrapping — GSPMD partitions dense ops natively.
    """
    loc_data, conf_data, landm_data = predictions
    bsz, num_priors = conf_data.shape[:2]

    interpret = matching_impl == "pallas_interpret"
    if matching_impl == "auto":
        matching_impl = (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
    if matching_impl.startswith("pallas"):
        # O(P)-memory fused kernel with valid-prefix early exit — faster
        # than the dense [B, G, P] path at real GT densities and saves
        # the 0.5 GB overlap tensor (see ops/matching_pallas.py).
        from jabd_tpu.ops.matching_pallas import match_batch_pallas

        match_fn = functools.partial(match_batch_pallas, interpret=interpret)
    else:
        match_fn = matching.match_batch

    if (
        matching_impl.startswith("pallas")
        and matching_mesh is not None
        and matching_mesh.size > 1
    ):
        if bsz % matching_mesh.size:
            raise ValueError(
                f"batch {bsz} (per loss call — the microbatch chunk when "
                f"microbatches>1) must divide the mesh size "
                f"{matching_mesh.size} for sharded Pallas matching; use "
                f"matching_impl='xla' or adjust the batch"
            )
        axis = matching_mesh.axis_names[0]
        from jax.sharding import PartitionSpec as P

        def _body(boxes, labels, landms, valid, pri):
            return match_fn(
                overlap_threshold, boxes, pri, variances, labels, landms,
                valid,
            )

        m = jax.shard_map(
            _body,
            mesh=matching_mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=P(axis),
            # per-sample compute only (no collectives); vma checking
            # rejects the opaque Pallas call
            check_vma=False,
        )(targets.boxes, targets.labels, targets.landms, targets.valid,
          priors)
    else:
        m = match_fn(
            overlap_threshold,
            targets.boxes,
            priors,
            variances,
            targets.labels,
            targets.landms,
            targets.valid,
        )

    pos1 = m.conf_t > 0  # landmark positives     [B, P]
    pos = m.conf_t != 0  # box positives          [B, P]

    # Landmark loss (sum-reduced smooth-L1 over pos1).
    landm_err = smooth_l1(landm_data - m.landm_t)
    loss_landm = jnp.sum(jnp.where(pos1[..., None], landm_err, 0.0))

    # Box regression loss over pos.
    if box_loss == "smooth_l1":
        loc_err = smooth_l1(loc_data - m.loc_t)
        loss_l = jnp.sum(jnp.where(pos[..., None], loc_err, 0.0))
    elif box_loss == "diou":
        # IouLoss (retinaface_training_DIOU.py:491-516): decode preds
        # against priors, then sum(1 - DIoU(decoded, raw GT)) over pos.
        decoded = B.decode(loc_data, priors[None], variances)
        diou = B.elementwise_diou(decoded, m.box_t)
        loss_l = jnp.sum(jnp.where(pos, 1.0 - diou, 0.0))
    else:
        raise ValueError(f"unknown box_loss {box_loss!r}")

    # Hard-negative mining on the ranking loss
    # log_sum_exp(conf) - conf[target] (retinaface_training.py:261).
    # conf[target] via an elementwise select on the 2-class axis —
    # take_along_axis lowers to a scalar-path gather on TPU (the same
    # disease the matching tail had; see scripts/bench_finish_match.py).
    gathered = jnp.where(pos, conf_data[..., 1], conf_data[..., 0])
    # lse - conf[target] IS the per-anchor cross-entropy
    # (-log_softmax gathered at the target) — computed once, used both
    # as the mining rank loss (:261) and the final CE (:287).
    ce = B.log_sum_exp(conf_data)[..., 0] - gathered
    loss_rank = jnp.where(pos, 0.0, ce)  # positives excluded (:264)

    # Double-argsort rank trick (:270-271), vmapped per image. Probed
    # alternatives (scripts/bench_mining.py at [128, 29126]): a single
    # descending VALUE sort (sum of top-num_neg values == the mined ce
    # sum, since positives are zeroed and ce >= 0) runs 4.6 vs 7.1 ms
    # forward — but jnp.sort's VJP scatters cotangents through the
    # permutation, adding an argsort+scatter to the BACKWARD that costs
    # more than the forward saving; a threshold-bisection form is 1.6 ms
    # but gives tie-elements zero gradient (rank semantics give exactly
    # num_neg selected). The integer-output argsorts below contribute
    # NOTHING to the backward (grad reaches conf only through the ce
    # mask), so this form wins end-to-end. (A sort+scatter rank
    # formulation was also measured SLOWER on TPU forward-only.)
    loss_idx = jnp.argsort(-loss_rank, axis=-1)
    idx_rank = jnp.argsort(loss_idx, axis=-1)
    num_pos = jnp.sum(pos, axis=-1, keepdims=True)  # [B, 1]
    num_neg = jnp.clip(neg_pos_ratio * num_pos, None, num_priors - 1)
    neg = idx_rank < num_neg  # [B, P]

    # Cross-entropy over pos + neg (:287-293), dense masked form.
    sel = pos | neg
    loss_c = jnp.sum(jnp.where(sel, ce, 0.0))

    n = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.0)
    n1 = jnp.maximum(jnp.sum(pos1).astype(jnp.float32), 1.0)
    return {
        "loss_l": loss_l / n,
        "loss_c": loss_c / n,
        "loss_landm": loss_landm / n1,
    }


def total_loss(
    losses: Dict[str, jnp.ndarray], loc_weight: float = 2.0
) -> jnp.ndarray:
    """loss = loc_weight * r + c + landm (train_mobilenetV3_ecagai.py:530)."""
    return (
        loc_weight * losses["loss_l"] + losses["loss_c"] + losses["loss_landm"]
    )
