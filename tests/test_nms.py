"""NMS keep-set parity: XLA greedy vs a numpy port of the reference greedy
(torchvision semantics / utils/utils_bbox.py:116-180), DIoU variant
(utils/utils_bbox.py:182-258), and the Pallas kernel (interpret mode on
CPU) against the XLA version."""

import numpy as np
import jax.numpy as jnp

from jabd_tpu.ops import nms as N
from jabd_tpu.ops import nms_pallas as NP
from tests.conftest import random_boxes


def np_greedy_nms(boxes, scores, thresh, kind="iou", beta1=1.0):
    """Golden greedy NMS: returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
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
        sup = metric > thresh
        sup[i] = False
        suppressed |= sup
    return np.asarray(keep)


def _kept(idx, valid):
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    return idx[valid]


def test_nms_matches_golden(rng):
    boxes = random_boxes(rng, 300)
    scores = rng.uniform(0, 1, 300).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.45)
    idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 400)
    np.testing.assert_array_equal(_kept(idx, valid), want)


def test_nms_diou_matches_golden(rng):
    boxes = random_boxes(rng, 200)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.45, kind="diou")
    idx, valid = N.nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, 256, kind="diou"
    )
    np.testing.assert_array_equal(_kept(idx, valid), want)


def test_nms_max_out_truncates(rng):
    boxes = random_boxes(rng, 100)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.99)  # high thresh keeps ~all
    idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.99, 10)
    np.testing.assert_array_equal(_kept(idx, valid), want[:10])


def test_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 64)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    valid_in = np.zeros(64, bool)
    valid_in[:32] = True
    want = np_greedy_nms(boxes[:32], scores[:32], 0.45)
    idx, valid = N.nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        0.45,
        64,
        valid=jnp.asarray(valid_in),
    )
    np.testing.assert_array_equal(_kept(idx, valid), want)


def test_identical_boxes_keep_first():
    boxes = np.asarray([[0, 0, 1, 1], [0, 0, 1, 1], [0, 0, 1, 1]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 4)
    np.testing.assert_array_equal(_kept(idx, valid), [0])


def test_topk_candidates(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    b, s, v = N.topk_candidates(jnp.asarray(boxes), jnp.asarray(scores), 10, 0.5)
    s = np.asarray(s)
    v = np.asarray(v)
    want_n = min(10, int((scores >= 0.5).sum()))
    assert v.sum() == want_n
    np.testing.assert_allclose(
        s[v], np.sort(scores[scores >= 0.5])[::-1][:want_n], rtol=1e-6
    )


def test_pallas_interpret_matches_xla(rng):
    boxes = random_boxes(rng, 333)
    scores = rng.uniform(0, 1, 333).astype(np.float32)
    for kind in ("iou", "diou"):
        idx_x, val_x = N.nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, 350, kind=kind
        )
        idx_p, val_p = NP.nms_pallas(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            0.45,
            350,
            kind=kind,
            interpret=True,
        )
        np.testing.assert_array_equal(_kept(idx_x, val_x), _kept(idx_p, val_p))


def test_nms_numpy_matches_golden(rng):
    boxes = random_boxes(rng, 150)
    scores = rng.uniform(0, 1, 150).astype(np.float32)
    for kind in ("iou", "diou"):
        want = np_greedy_nms(boxes, scores, 0.45, kind=kind)
        got = N.nms_numpy(boxes, scores, 0.45, kind=kind)
        np.testing.assert_array_equal(got, want)
