"""Dense matching parity with a numpy port of the reference per-image
`match` (nets/retinaface_training.py:93-162), including the forced
best-prior semantics (later GT wins on conflict) and padding behavior."""

import numpy as np
import jax.numpy as jnp

from jabd_tpu.ops import matching
from jabd_tpu.ops import anchors as A
from jabd_tpu import configs
from tests.conftest import random_boxes
from tests.test_boxes import np_encode, np_jaccard

VAR = (0.1, 0.2)


def np_point_form(p):
    return np.concatenate([p[:, :2] - p[:, 2:] / 2, p[:, :2] + p[:, 2:] / 2], 1)


def np_match(threshold, truths, priors, variances, labels, landms):
    """Golden port of nets/retinaface_training.py:93-162."""
    overlaps = np_jaccard(truths, np_point_form(priors))
    best_prior_idx = overlaps.argmax(1)
    best_truth_overlap = overlaps.max(0)
    best_truth_idx = overlaps.argmax(0)
    best_truth_overlap[best_prior_idx] = 2
    for j in range(best_prior_idx.shape[0]):
        best_truth_idx[best_prior_idx[j]] = j
    matches = truths[best_truth_idx]
    conf = labels[best_truth_idx].copy()
    conf[best_truth_overlap < threshold] = 0
    loc = np_encode(matches, priors, variances)
    # encode_landm
    pts = landms[best_truth_idx].reshape(-1, 5, 2)
    g = (pts - priors[:, None, :2]) / (variances[0] * priors[:, None, 2:])
    landm = g.reshape(-1, 10)
    return loc, conf, landm


def _random_problem(rng, num_gt, image=256):
    cfg = configs.AnchorConfig(
        min_sizes=((16, 32), (64, 128)), steps=(16, 32)
    )
    priors = A.generate_anchors(cfg, (image, image))
    truths = random_boxes(rng, num_gt)
    labels = rng.choice([1.0, -1.0], size=(num_gt,)).astype(np.float32)
    landms = rng.uniform(0, 1, size=(num_gt, 10)).astype(np.float32)
    return priors, truths, labels, landms


def test_match_parity_no_padding(rng):
    priors, truths, labels, landms = _random_problem(rng, 7)
    want_loc, want_conf, want_landm = np_match(
        0.35, truths, priors, VAR, labels, landms
    )
    got = matching.match_single(
        0.35,
        jnp.asarray(truths),
        jnp.asarray(priors),
        VAR,
        jnp.asarray(labels),
        jnp.asarray(landms),
        jnp.ones((7,), dtype=bool),
    )
    conf = np.asarray(got.conf_t)
    np.testing.assert_array_equal(conf, want_conf)
    fg = want_conf != 0
    np.testing.assert_allclose(
        np.asarray(got.loc_t)[fg], want_loc[fg], rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.landm_t)[fg], want_landm[fg], rtol=1e-3, atol=5e-4
    )


def test_match_parity_with_padding(rng):
    priors, truths, labels, landms = _random_problem(rng, 5)
    pad = 11
    truths_p = np.zeros((pad, 4), np.float32)
    truths_p[:5] = truths
    labels_p = np.zeros((pad,), np.float32)
    labels_p[:5] = labels
    landms_p = np.zeros((pad, 10), np.float32)
    landms_p[:5] = landms
    valid = np.zeros((pad,), bool)
    valid[:5] = True

    want_loc, want_conf, want_landm = np_match(
        0.35, truths, priors, VAR, labels, landms
    )
    got = matching.match_single(
        0.35,
        jnp.asarray(truths_p),
        jnp.asarray(priors),
        VAR,
        jnp.asarray(labels_p),
        jnp.asarray(landms_p),
        jnp.asarray(valid),
    )
    np.testing.assert_array_equal(np.asarray(got.conf_t), want_conf)
    fg = want_conf != 0
    np.testing.assert_allclose(
        np.asarray(got.loc_t)[fg], want_loc[fg], rtol=1e-3, atol=5e-4
    )
    # Padding must not produce NaNs anywhere.
    assert np.isfinite(np.asarray(got.loc_t)).all()
    assert np.isfinite(np.asarray(got.landm_t)).all()


def test_forced_match_last_gt_wins():
    """Two GTs whose best prior is the same cell: reference loop gives the
    later GT the prior (retinaface_training.py:129-130)."""
    priors = np.asarray([[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]], np.float32)
    # Both GTs overlap prior 0 best.
    truths = np.asarray(
        [[0.42, 0.42, 0.58, 0.58], [0.45, 0.45, 0.62, 0.62]], np.float32
    )
    labels = np.asarray([1.0, -1.0], np.float32)
    landms = np.zeros((2, 10), np.float32)
    want_loc, want_conf, want_landm = np_match(
        0.35, truths, priors, VAR, labels, landms
    )
    got = matching.match_single(
        0.35,
        jnp.asarray(truths),
        jnp.asarray(priors),
        VAR,
        jnp.asarray(labels),
        jnp.asarray(landms),
        jnp.ones((2,), bool),
    )
    np.testing.assert_array_equal(np.asarray(got.conf_t), want_conf)
    # Prior 0 must be assigned to GT 1 (label -1).
    assert np.asarray(got.conf_t)[0] == -1.0


def test_match_batch_vmap(rng):
    priors, truths, labels, landms = _random_problem(rng, 4)
    b_truths = np.stack([truths, truths[::-1].copy()])
    b_labels = np.stack([labels, labels[::-1].copy()])
    b_landms = np.stack([landms, landms[::-1].copy()])
    valid = np.ones((2, 4), bool)
    out = matching.match_batch(
        0.35,
        jnp.asarray(b_truths),
        jnp.asarray(priors),
        VAR,
        jnp.asarray(b_labels),
        jnp.asarray(b_landms),
        jnp.asarray(valid),
    )
    assert out.loc_t.shape == (2, priors.shape[0], 4)
    assert out.conf_t.shape == (2, priors.shape[0])
    for i, (t, l, lm) in enumerate(
        [(truths, labels, landms), (truths[::-1], labels[::-1], landms[::-1])]
    ):
        _, want_conf, _ = np_match(0.35, np.ascontiguousarray(t), priors, VAR,
                                   np.ascontiguousarray(l), np.ascontiguousarray(lm))
        np.testing.assert_array_equal(np.asarray(out.conf_t)[i], want_conf)


def test_pallas_matching_interpret_parity(rng):
    """ops/matching_pallas.py must produce bit-identical MatchResults to
    the XLA path (interpret mode on CPU; TPU parity verified on-device)."""
    import jax.numpy as jnp2

    from jabd_tpu.ops.matching_pallas import match_batch_pallas

    priors, truths, labels, landms = _random_problem(rng, 7)
    bsz = 2
    b_truths = np.stack([truths, truths[::-1].copy()])
    b_labels = np.stack([labels, labels[::-1].copy()])
    b_landms = np.stack([landms, landms[::-1].copy()])
    valid = np.zeros((bsz, 7), bool)
    valid[0, :7] = True
    valid[1, :3] = True
    args = (
        0.35,
        jnp2.asarray(b_truths),
        jnp2.asarray(priors),
        (0.1, 0.2),
        jnp2.asarray(b_labels),
        jnp2.asarray(b_landms),
        jnp2.asarray(valid),
    )
    want = matching.match_batch(*args)
    got = match_batch_pallas(*args, interpret=True)
    for f in ("conf_t", "loc_t", "landm_t", "box_t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
            err_msg=f,
        )


def test_pallas_matching_tie_break_parity():
    """Duplicate GT boxes (exact IoU ties) must resolve to the LOWEST gt
    index like jnp.argmax — regression for the sublane tournament's
    pairing-branch tie bug (ties in different halves, e.g. gts 2 and 4,
    previously kept the higher index)."""
    import jax.numpy as jnp2

    from jabd_tpu.ops import matching
    from jabd_tpu.ops.matching_pallas import match_batch_pallas

    rng = np.random.default_rng(11)
    priors = np.zeros((256, 4), np.float32)
    priors[:, :2] = rng.uniform(0.1, 0.9, (256, 2))
    priors[:, 2:] = rng.uniform(0.05, 0.3, (256, 2))

    g = 8
    truths = np.zeros((g, 4), np.float32)
    base = np.array([0.3, 0.3, 0.6, 0.6], np.float32)
    other = np.array([0.5, 0.5, 0.9, 0.9], np.float32)
    # identical boxes at indices 1, 2, 4, 6 -> exact tied IoUs across
    # sublane pairing branches
    for i in range(g):
        truths[i] = base if i in (1, 2, 4, 6) else other
    labels = np.arange(1, g + 1, dtype=np.float32) % 2 + 1
    landms = rng.uniform(0, 1, (g, 10)).astype(np.float32)
    valid = np.ones((1, g), bool)

    args = (
        0.35,
        jnp2.asarray(truths[None]),
        jnp2.asarray(priors),
        (0.1, 0.2),
        jnp2.asarray(labels[None]),
        jnp2.asarray(landms[None]),
        jnp2.asarray(valid),
    )
    want = matching.match_batch(*args)
    got = match_batch_pallas(*args, interpret=True)
    for f in ("conf_t", "loc_t", "landm_t", "box_t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
            err_msg=f,
        )
