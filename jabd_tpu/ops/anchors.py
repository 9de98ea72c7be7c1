"""Vectorized anchor (prior box) generation.

The reference builds anchors with a Python triple loop on CPU, re-run per
image size (`utils/anchors.py:23-42`) — a known hotspot when
`letterbox_image=False` re-generates 67k anchors per frame
(`predict.py:146`). Here anchor generation is a vectorized numpy/meshgrid
computation, memoised per (config, image_size), and folded into jitted
graphs as a constant.

Semantics (exact mirror of utils/anchors.py:23-42):
  for level k with step s and feature map (fh, fw) = (ceil(H/s), ceil(W/s)):
    for each cell (i, j) row-major, for each min_size m:
      anchor = (cx, cy, sw, sh)
             = ((j + 0.5) * s / W, (i + 0.5) * s / H, m / W, m / H)
Output: [N, 4] float32 in normalized cxcywh form; optional clip to [0, 1].
Counts: 29,126 @840x840 3-level cfg_mnet; 67,200 @1280x1280; 29,518 for the
4-level cfg_re50_self (utils/anchors.py:86 comment).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

from jabd_tpu.configs import AnchorConfig


def feature_map_shapes(
    cfg: AnchorConfig, image_size: Tuple[int, int]
) -> Tuple[Tuple[int, int], ...]:
    """(ceil(H/step), ceil(W/step)) per level — utils/anchors.py:21."""
    h, w = image_size
    return tuple(
        (math.ceil(h / step), math.ceil(w / step)) for step in cfg.steps
    )


def num_anchors(cfg: AnchorConfig, image_size: Tuple[int, int]) -> int:
    return sum(
        fh * fw * len(ms)
        for (fh, fw), ms in zip(feature_map_shapes(cfg, image_size), cfg.min_sizes)
    )


@functools.lru_cache(maxsize=64)
def generate_anchors(
    cfg: AnchorConfig, image_size: Tuple[int, int]
) -> np.ndarray:
    """Build the full anchor set for `image_size` = (H, W).

    Returns float32 [N, 4] (cx, cy, w, h) normalized, in the exact row
    order of the reference generator.
    """
    h, w = image_size
    out = []
    for (fh, fw), step, min_sizes in zip(
        feature_map_shapes(cfg, image_size), cfg.steps, cfg.min_sizes
    ):
        m = np.asarray(min_sizes, dtype=np.float64)  # [A]
        a = len(min_sizes)
        # Cell centers, row-major over (i, j) like the reference product().
        cy, cx = np.meshgrid(
            (np.arange(fh, dtype=np.float64) + 0.5) * step / h,
            (np.arange(fw, dtype=np.float64) + 0.5) * step / w,
            indexing="ij",
        )  # [fh, fw]
        level = np.empty((fh, fw, a, 4), dtype=np.float64)
        level[..., 0] = cx[:, :, None]
        level[..., 1] = cy[:, :, None]
        level[..., 2] = (m / w)[None, None, :]
        level[..., 3] = (m / h)[None, None, :]
        out.append(level.reshape(-1, 4))
    anchors = np.concatenate(out, axis=0).astype(np.float32)
    if cfg.clip:
        anchors = np.clip(anchors, 0.0, 1.0)
    anchors.setflags(write=False)
    return anchors
