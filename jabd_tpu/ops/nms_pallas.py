"""Fused Pallas TPU kernel for exact greedy NMS.

Replaces torchvision's C++/CUDA `nms` (utils/utils_bbox.py:3,275) on the
hot inference path. The XLA reference implementation lives in
`jabd_tpu.ops.nms`; this kernel produces the identical keep set but runs
the whole greedy pass inside one Pallas program, with the candidate set
resident in VMEM in a columnar [8, K] layout (rows = x1, y1, x2, y2, area,
valid) so each greedy step is a full-width VPU operation over K lanes —
no per-step XLA dispatch, no HBM traffic after the initial load.

Supports plain IoU and DIoU suppression (utils/utils_bbox.py:182-258).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jabd_tpu.ops import nms as N
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def _check_kind(kind: str) -> None:
    """Static-arg guard: the kernel computes DIoU only for kind ==
    'diou' and plain IoU otherwise, while the XLA twin raises on
    unknown kinds — without this check a typo ('DIoU') silently ran
    plain-IoU suppression on TPU but errored on CPU."""
    if kind not in ("iou", "diou"):
        raise ValueError(f"unknown nms kind: {kind!r} (iou|diou)")

def _nms_kernel(cols_ref, keep_ref, *, k: int, iou_threshold: float,
                kind: str, beta1: float):
    """One grid step = one image. cols_ref: [8, K] f32; keep_ref: [8, K] f32.

    Row layout: 0:x1 1:y1 2:x2 3:y2 4:area 5:valid.
    """
    x1 = cols_ref[0:1, :]
    y1 = cols_ref[1:2, :]
    x2 = cols_ref[2:3, :]
    y2 = cols_ref[3:4, :]
    areas = cols_ref[4:5, :]
    valid_f = cols_ref[5:6, :]  # 1.0 / 0.0

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    # The keep mask is carried as float32 (0/1): Mosaic mis-lays-out 1-bit
    # vector loop carries (vpad mask_cast crash), floats are safe and the
    # arithmetic is equivalent.
    def body(i, keep_f):
        sel = lane == i
        self = jnp.where(sel, 1.0, 0.0)
        # Broadcast-extract box i's scalars (VPU reduction over lanes).
        xi1 = jnp.sum(self * x1)
        yi1 = jnp.sum(self * y1)
        xi2 = jnp.sum(self * x2)
        yi2 = jnp.sum(self * y2)
        area_i = (xi2 - xi1) * (yi2 - yi1)
        keep_i = jnp.sum(self * keep_f)  # 1.0 if box i still kept

        xx1 = jnp.maximum(x1, xi1)
        yy1 = jnp.maximum(y1, yi1)
        xx2 = jnp.minimum(x2, xi2)
        yy2 = jnp.minimum(y2, yi2)
        inter = jnp.maximum(xx2 - xx1, 0.0) * jnp.maximum(yy2 - yy1, 0.0)
        union = areas + area_i - inter
        metric = inter / jnp.where(union > 0, union, 1.0)
        if kind == "diou":
            cxi = (xi1 + xi2) * 0.5
            cyi = (yi1 + yi2) * 0.5
            cx = (x1 + x2) * 0.5
            cy = (y1 + y2) * 0.5
            d = (cxi - cx) ** 2 + (cyi - cy) ** 2
            ex1 = jnp.minimum(x1, xi1)
            ey1 = jnp.minimum(y1, yi1)
            ex2 = jnp.maximum(x2, xi2)
            ey2 = jnp.maximum(y2, yi2)
            c = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
            u = d / jnp.where(c > 0, c, 1.0)
            metric = metric - u**beta1

        sup = (
            (metric > iou_threshold)
            & (lane > i)
            & (keep_i > 0.5)
        )
        return jnp.where(sup, 0.0, keep_f)

    # Sorted-by-score input => valid rows are a prefix; loop only over them
    # (typically tens of candidates survive the confidence filter).
    n_valid = jnp.sum(valid_f).astype(jnp.int32)
    keep_f = jax.lax.fori_loop(0, n_valid, body, valid_f)
    keep_ref[:, :] = jnp.broadcast_to(keep_f, (8, k)).astype(jnp.float32)


def _build_cols(boxes: jnp.ndarray, valid: jnp.ndarray, kp: int) -> jnp.ndarray:
    """[..., K, 4] boxes + [..., K] valid -> [..., 8, kp] columnar layout."""
    k = boxes.shape[-2]
    b = boxes.astype(jnp.float32)
    x1, y1 = b[..., 0], b[..., 1]
    x2, y2 = b[..., 2], b[..., 3]
    area = (x2 - x1) * (y2 - y1)
    rows = jnp.stack(
        [x1, y1, x2, y2, area, jnp.where(valid, 1.0, 0.0)], axis=-2
    )  # [..., 6, k]
    pad = [(0, 0)] * (rows.ndim - 2) + [(0, 2), (0, kp - k)]
    return jnp.pad(rows, pad)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "kind", "beta1", "interpret")
)
def nms_keep_sorted_pallas_batched(
    boxes: jnp.ndarray,  # [B, K, 4] corner form, each row sorted by score
    valid: jnp.ndarray,  # [B, K] bool
    iou_threshold: float = 0.45,
    kind: str = "iou",
    beta1: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched exact greedy NMS: ONE pallas_call with a grid over images.

    vmapping the single-image kernel dispatches B kernels and pays the
    fixed launch/DMA overhead B times (~0.09 ms each — it dominated the
    batched inference pipeline); a grid amortizes it to one launch.
    Returns [B, K] bool keep masks.
    """
    _check_kind(kind)
    bsz, k = boxes.shape[0], boxes.shape[1]
    kp = _round_up(max(k, _LANES), _LANES)
    cols = _build_cols(boxes, valid, kp)  # [B, 8, kp]

    kernel = functools.partial(
        _nms_kernel,
        k=kp,
        iou_threshold=iou_threshold,
        kind=kind,
        beta1=beta1,
    )

    def kernel3(cols_ref, keep_ref):
        kernel(cols_ref.at[0], keep_ref.at[0])

    out = pl.pallas_call(
        kernel3,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, kp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 8, kp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 8, kp), jnp.float32),
        interpret=interpret,
    )(cols)
    return out[:, 0, :k] > 0.5


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "kind", "beta1", "interpret"),
)
def nms_keep_sorted_pallas(
    boxes: jnp.ndarray,  # [K, 4] corner form, sorted by descending score
    valid: jnp.ndarray,  # [K] bool
    iou_threshold: float = 0.45,
    kind: str = "iou",
    beta1: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas twin of nms.nms_keep_sorted — identical keep set."""
    _check_kind(kind)
    k = boxes.shape[0]
    kp = _round_up(max(k, _LANES), _LANES)
    cols = _build_cols(boxes, valid, kp)  # [8, kp]

    out = pl.pallas_call(
        functools.partial(
            _nms_kernel,
            k=kp,
            iou_threshold=iou_threshold,
            kind=kind,
            beta1=beta1,
        ),
        out_shape=jax.ShapeDtypeStruct((8, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cols)
    return out[0, :k] > 0.5


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_out", "kind", "beta1", "interpret"),
)
def nms_pallas(
    boxes: jnp.ndarray,  # [N, 4]
    scores: jnp.ndarray,  # [N]
    iou_threshold: float = 0.45,
    max_out: int = 750,
    valid: jnp.ndarray | None = None,
    kind: str = "iou",
    beta1: float = 1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in twin of nms.nms: returns ([max_out] indices, valid mask)."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, -1e30)
    order = jnp.argsort(-masked_scores)
    keep = nms_keep_sorted_pallas(
        boxes[order], valid[order], iou_threshold, kind, beta1,
        interpret=interpret,
    )
    return N.compact_keep(keep, order, max_out)
