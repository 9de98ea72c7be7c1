"""Edge-case hardening: empty ground truth, single-GT images, degenerate
boxes, all-background batches — none may produce NaN/Inf or crash."""

import numpy as np
import jax
import jax.numpy as jnp

from jabd_tpu import configs, losses
from jabd_tpu.ops import anchors as A
from jabd_tpu.ops import matching
from jabd_tpu.ops import nms as N
from tests.conftest import random_boxes

CFG = configs.AnchorConfig(min_sizes=((16, 32), (64, 128)), steps=(16, 32))
VAR = (0.1, 0.2)


def _priors():
    return jnp.asarray(A.generate_anchors(CFG, (128, 128)))


def test_loss_with_all_padded_gt(rng):
    """An image whose every GT row is padding (valid all-False): the loss
    must stay finite with zero positives."""
    priors = _priors()
    p = priors.shape[0]
    preds = (
        jnp.asarray(rng.normal(0, 0.5, (2, p, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 1, (2, p, 2)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.5, (2, p, 10)).astype(np.float32)),
    )
    targets = losses.Targets(
        boxes=jnp.zeros((2, 4, 4)),
        labels=jnp.zeros((2, 4)),
        landms=jnp.zeros((2, 4, 10)),
        valid=jnp.zeros((2, 4), bool),
    )
    out = losses.multibox_loss(preds, priors, targets)
    for v in out.values():
        assert np.isfinite(float(v)), out


def test_match_single_gt(rng):
    priors = _priors()
    got = matching.match_single(
        0.35,
        jnp.asarray(random_boxes(rng, 1)),
        priors,
        VAR,
        jnp.ones((1,)),
        jnp.zeros((1, 10)),
        jnp.ones((1,), bool),
    )
    # The forced best-prior match guarantees at least one positive.
    assert int(jnp.sum(got.conf_t != 0)) >= 1
    assert np.isfinite(np.asarray(got.loc_t)).all()


def test_match_degenerate_gt_box(rng):
    """Zero-area GT box must not produce NaN (IoU 0/x)."""
    priors = _priors()
    truths = jnp.asarray([[0.5, 0.5, 0.5, 0.5]], jnp.float32)  # zero area
    got = matching.match_single(
        0.35, truths, priors, VAR, jnp.ones((1,)), jnp.zeros((1, 10)),
        jnp.ones((1,), bool),
    )
    assert np.isfinite(np.asarray(got.loc_t)).all()
    assert np.isfinite(np.asarray(got.landm_t)).all()


def test_nms_no_valid_candidates():
    boxes = jnp.zeros((16, 4))
    scores = jnp.zeros((16,))
    idx, valid = N.nms(
        boxes, scores, 0.45, 8, valid=jnp.zeros((16,), bool)
    )
    assert int(valid.sum()) == 0


def test_nms_single_candidate(rng):
    b = jnp.asarray(random_boxes(rng, 1))
    idx, valid = N.nms(b, jnp.asarray([0.9]), 0.45, 4)
    assert int(valid.sum()) == 1 and int(idx[0]) == 0


def test_detect_batch_zero_detections(rng):
    """Confidence 1.0 -> nothing passes -> valid mask all-False, no NaN."""
    import dataclasses
    import functools

    from jabd_tpu.models import build_model
    from jabd_tpu.predict import detect_batch

    mcfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (64, 64)))
    pcfg = configs.PredictConfig(
        confidence=1.1, input_shape=(64, 64), max_detections=16,
        pre_nms_topk=32,
    )
    dets, valid = detect_batch(
        functools.partial(model.apply),
        variables,
        jnp.zeros((1, 64, 64, 3)),
        anchors,
        pcfg,
        variances=mcfg.anchors.variance,
        use_pallas=False,
    )
    assert int(valid.sum()) == 0
    assert np.isfinite(np.asarray(dets)).all()
