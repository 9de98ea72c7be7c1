"""5-point landmark face alignment (similarity transform to the
ArcFace template).

The reference's recognition half consumes PRE-aligned 112x112 crops
produced outside the repo (validation_lq/tinyface_helper.py:18
`aligned_pad_0.1_pad_high`, evaluate_helper.py:47
`list_ijbs_mtcnncaffe_aligned.txt`) — the aligner itself ships nowhere,
so the detector's 5-point landmark output (predict.py:175 decode_landm)
can never reach the embedder in-repo. This module closes that gap: the
standard ArcFace alignment — a least-squares similarity transform
(Umeyama) from the detected 5 landmarks onto the canonical 112x112
template — so JABD detections feed the IR embedders directly
(see jabd_tpu/pipeline.py).
"""

from __future__ import annotations

import numpy as np

# Canonical ArcFace/insightface 5-point destination template for a
# 112x112 crop: left eye, right eye, nose tip, left mouth corner,
# right mouth corner — the same template that produced the aligned
# datasets the reference evaluates on.
ARCFACE_TEMPLATE = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    np.float32,
)


def similarity_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity (scale+rotation+translation) mapping
    `src` [N,2] onto `dst` [N,2]; returns the 2x3 affine matrix
    (Umeyama 1991 — the algorithm behind skimage's
    SimilarityTransform.estimate, which insightface alignment uses)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sd = src - mu_s
    dd = dst - mu_d
    cov = dd.T @ sd / n
    u, s, vt = np.linalg.svd(cov)
    d = np.ones(2)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        d[-1] = -1.0
    rot = u @ np.diag(d) @ vt
    var_s = (sd**2).sum() / n
    scale = (s * d).sum() / var_s if var_s > 0 else 1.0
    t = mu_d - scale * rot @ mu_s
    m = np.empty((2, 3), np.float64)
    m[:, :2] = scale * rot
    m[:, 2] = t
    return m.astype(np.float32)


def align_face(
    image: np.ndarray, landmarks: np.ndarray, size: int = 112
) -> np.ndarray:
    """Warp `image` so `landmarks` [5,2] (pixel coords) land on the
    ArcFace template scaled to `size`; returns the [size,size,3] crop."""
    import cv2

    tmpl = ARCFACE_TEMPLATE * (size / 112.0)
    m = similarity_transform(np.asarray(landmarks, np.float32), tmpl)
    return cv2.warpAffine(
        image, m, (size, size), flags=cv2.INTER_LINEAR, borderValue=0
    )


def landmarks_from_detection(det: np.ndarray) -> np.ndarray:
    """[15] detection row (x1 y1 x2 y2 score lx1 ly1 ... lx5 ly5, the
    Predictor.detect_image pixel-space layout) -> [5,2] landmarks."""
    return np.asarray(det[5:15], np.float32).reshape(5, 2)


def align_from_detections(
    image: np.ndarray, dets: np.ndarray, size: int = 112
) -> np.ndarray:
    """Align every face in a [N,15] detection array; returns
    [N,size,size,3] crops in the image's dtype/channel order."""
    if len(dets) == 0:
        return np.zeros((0, size, size, 3), image.dtype)
    return np.stack(
        [
            align_face(image, landmarks_from_detection(d), size)
            for d in dets
        ]
    )
