"""Box codec and IoU math tests: round-trips, hand-checked cases, and
golden parity with numpy ports of the reference formulas
(utils/utils_bbox.py:29-46, nets/retinaface_training.py:61-88)."""

import numpy as np
import jax.numpy as jnp

from jabd_tpu.ops import boxes as B
from tests.conftest import random_boxes

VAR = (0.1, 0.2)


def np_decode(loc, priors, variances):
    """Golden port of utils/utils_bbox.py:29-34."""
    boxes = np.concatenate(
        (
            priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
            priors[:, 2:] * np.exp(loc[:, 2:] * variances[1]),
        ),
        1,
    )
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def np_encode(matched, priors, variances):
    """Golden port of nets/retinaface_training.py:61-70."""
    g_cxcy = (matched[:, :2] + matched[:, 2:]) / 2 - priors[:, :2]
    g_cxcy /= variances[0] * priors[:, 2:]
    g_wh = (matched[:, 2:] - matched[:, :2]) / priors[:, 2:]
    g_wh = np.log(g_wh) / variances[1]
    return np.concatenate([g_cxcy, g_wh], 1)


def np_jaccard(a, b):
    max_xy = np.minimum(a[:, None, 2:], b[None, :, 2:])
    min_xy = np.maximum(a[:, None, :2], b[None, :, :2])
    inter = np.clip(max_xy - min_xy, 0, None)
    inter = inter[..., 0] * inter[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / (area_a + area_b - inter)


def test_point_center_roundtrip(rng):
    b = random_boxes(rng, 64)
    c = B.center_size(jnp.asarray(b))
    p = B.point_form(c)
    np.testing.assert_allclose(np.asarray(p), b, atol=1e-6)


def test_decode_matches_reference(rng):
    priors = np.abs(rng.normal(0.5, 0.2, size=(128, 4))).astype(np.float32)
    priors[:, 2:] = np.clip(priors[:, 2:], 0.05, 1.0)
    loc = rng.normal(0, 1, size=(128, 4)).astype(np.float32)
    got = np.asarray(B.decode(jnp.asarray(loc), jnp.asarray(priors), VAR))
    want = np_decode(loc.copy(), priors.copy(), VAR)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encode_decode_roundtrip(rng):
    priors = np.concatenate(
        [
            rng.uniform(0.2, 0.8, size=(200, 2)),
            rng.uniform(0.05, 0.3, size=(200, 2)),
        ],
        axis=1,
    ).astype(np.float32)
    gt = random_boxes(rng, 200)
    enc = B.encode(jnp.asarray(gt), jnp.asarray(priors), VAR)
    dec = B.decode(enc, jnp.asarray(priors), VAR)
    # float32 log->exp round-trip amplifies error (encoded vals reach ~1e2).
    np.testing.assert_allclose(np.asarray(dec), gt, rtol=1e-3, atol=1e-3)
    # And encode matches the reference formula (float32 cancellation noise
    # in the centered term bounds achievable agreement).
    np.testing.assert_allclose(
        np.asarray(enc), np_encode(gt, priors, VAR), rtol=1e-3, atol=5e-4
    )


def test_landm_encode_decode_roundtrip(rng):
    priors = np.concatenate(
        [
            rng.uniform(0.2, 0.8, size=(50, 2)),
            rng.uniform(0.05, 0.3, size=(50, 2)),
        ],
        axis=1,
    ).astype(np.float32)
    landms = rng.uniform(0, 1, size=(50, 10)).astype(np.float32)
    enc = B.encode_landm(jnp.asarray(landms), jnp.asarray(priors), VAR)
    dec = B.decode_landm(enc, jnp.asarray(priors), VAR)
    np.testing.assert_allclose(np.asarray(dec), landms, rtol=1e-4, atol=1e-5)


def test_jaccard_matches_numpy(rng):
    a = random_boxes(rng, 37)
    b = random_boxes(rng, 53)
    got = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_jaccard(a, b), rtol=1e-5, atol=1e-6)


def test_iou_identity():
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 3.0, 3.0]])
    m = B.jaccard(b, b)
    np.testing.assert_allclose(np.asarray(m), np.eye(2), atol=1e-6)


def test_iou_hand_case():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0]])
    # inter = 1, union = 4 + 4 - 1 = 7
    np.testing.assert_allclose(np.asarray(B.jaccard(a, b)), [[1 / 7]], atol=1e-6)


def test_giou_diou_ciou_bounds(rng):
    a = jnp.asarray(random_boxes(rng, 20))
    b = jnp.asarray(random_boxes(rng, 30))
    for kind in ("giou", "diou", "ciou"):
        m = np.asarray(B.iou_pairwise_general(a, b, kind))
        assert np.all(m <= 1.0 + 1e-6)
        assert np.all(m >= -2.0)
    # Identical boxes: all generalized IoUs equal 1.
    same = np.asarray(B.iou_pairwise_general(a, a, "diou")).diagonal()
    np.testing.assert_allclose(same, 1.0, atol=1e-5)


def test_elementwise_diou_matches_pairwise_diag(rng):
    a = jnp.asarray(random_boxes(rng, 25))
    b = jnp.asarray(random_boxes(rng, 25))
    elem = np.asarray(B.elementwise_diou(a, b))
    pair = np.asarray(B.iou_pairwise_general(a, b, "diou")).diagonal()
    np.testing.assert_allclose(elem, pair, rtol=1e-4, atol=1e-5)


def test_log_sum_exp_stable():
    x = jnp.asarray([[1000.0, 1000.0], [0.0, 0.0]])
    out = np.asarray(B.log_sum_exp(x))
    np.testing.assert_allclose(
        out[:, 0], [1000.0 + np.log(2), np.log(2)], rtol=1e-6
    )
