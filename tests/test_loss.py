"""MultiBox loss parity against a numpy golden port of
nets/retinaface_training.py:165-303 (per-image matching, hard-negative
mining, normalization) and a DIoU-mode sanity check."""

import numpy as np
import jax.numpy as jnp

from jabd_tpu import losses
from jabd_tpu.ops import anchors as A
from jabd_tpu import configs
from tests.conftest import random_boxes
from tests.test_matching import np_match

VAR = (0.1, 0.2)


def np_smooth_l1(x):
    ax = np.abs(x)
    return np.where(ax < 1, 0.5 * x * x, ax - 0.5)


def np_multibox_loss(
    loc_data, conf_data, landm_data, priors, target_list,
    threshold=0.35, negpos=7, var=VAR,
):
    """Golden port of MultiBoxLoss.forward (retinaface_training.py:183-303).

    target_list: list of (truths [g,4], labels [g], landms [g,10]).
    """
    num, num_priors = conf_data.shape[:2]
    loc_t = np.zeros((num, num_priors, 4), np.float32)
    conf_t = np.zeros((num, num_priors), np.float32)
    landm_t = np.zeros((num, num_priors, 10), np.float32)
    for i, (truths, labels, landms) in enumerate(target_list):
        l, c, lm = np_match(threshold, truths, priors, var, labels, landms)
        loc_t[i], conf_t[i], landm_t[i] = l, c, lm

    pos1 = conf_t > 0
    loss_landm = np_smooth_l1(landm_data - landm_t)[pos1].sum()

    pos = conf_t != 0
    loss_l = np_smooth_l1(loc_data - loc_t)[pos].sum()

    conf_t_cls = np.where(pos, 1, 0)
    flat = conf_data.reshape(-1, 2)
    x_max = flat.max()
    lse = np.log(np.exp(flat - x_max).sum(1)) + x_max
    gathered = np.take_along_axis(
        flat, conf_t_cls.reshape(-1, 1), axis=1
    )[:, 0]
    loss_c = (lse - gathered).reshape(num, num_priors)
    loss_c[pos] = 0
    loss_idx = np.argsort(-loss_c, axis=1, kind="stable")
    idx_rank = np.argsort(loss_idx, axis=1, kind="stable")
    num_pos = pos.sum(1, keepdims=True)
    num_neg = np.clip(negpos * num_pos, None, num_priors - 1)
    neg = idx_rank < num_neg

    sel = pos | neg
    logits = conf_data[sel]
    t = conf_t_cls[sel]
    shift = logits - logits.max(1, keepdims=True)
    logp = shift - np.log(np.exp(shift).sum(1, keepdims=True))
    ce = -np.take_along_axis(logp, t[:, None], axis=1).sum()

    n = max(num_pos.sum(), 1)
    n1 = max(pos1.sum(), 1)
    return loss_l / n, ce / n, loss_landm / n1


def _make_problem(rng, bsz=2, gts=(3, 5)):
    cfg = configs.AnchorConfig(
        min_sizes=((16, 32), (64, 128)), steps=(16, 32)
    )
    priors = A.generate_anchors(cfg, (128, 128))
    p = priors.shape[0]
    loc = rng.normal(0, 0.5, (bsz, p, 4)).astype(np.float32)
    conf = rng.normal(0, 1.0, (bsz, p, 2)).astype(np.float32)
    landm = rng.normal(0, 0.5, (bsz, p, 10)).astype(np.float32)
    target_list = []
    gmax = max(gts)
    boxes = np.zeros((bsz, gmax, 4), np.float32)
    labels = np.zeros((bsz, gmax), np.float32)
    landms = np.zeros((bsz, gmax, 10), np.float32)
    valid = np.zeros((bsz, gmax), bool)
    for i, g in enumerate(gts):
        t = random_boxes(rng, g)
        l = rng.choice([1.0, -1.0], size=(g,)).astype(np.float32)
        lm = rng.uniform(0, 1, (g, 10)).astype(np.float32)
        lm[l == -1] = 0.0  # dataloader zeroes landmarks where flag == -1
        target_list.append((t, l, lm))
        boxes[i, :g], labels[i, :g], landms[i, :g] = t, l, lm
        valid[i, :g] = True
    targets = losses.Targets(
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        landms=jnp.asarray(landms),
        valid=jnp.asarray(valid),
    )
    return priors, (loc, conf, landm), target_list, targets


def test_multibox_loss_parity(rng):
    priors, preds, target_list, targets = _make_problem(rng)
    want_l, want_c, want_landm = np_multibox_loss(
        *preds, priors, target_list
    )
    got = losses.multibox_loss(
        tuple(jnp.asarray(p) for p in preds),
        jnp.asarray(priors),
        targets,
    )
    np.testing.assert_allclose(float(got["loss_l"]), want_l, rtol=2e-3)
    np.testing.assert_allclose(float(got["loss_c"]), want_c, rtol=2e-3)
    np.testing.assert_allclose(float(got["loss_landm"]), want_landm, rtol=2e-3)


def test_total_loss_weighting(rng):
    priors, preds, _, targets = _make_problem(rng)
    got = losses.multibox_loss(
        tuple(jnp.asarray(p) for p in preds), jnp.asarray(priors), targets
    )
    tot = losses.total_loss(got, loc_weight=2.0)
    np.testing.assert_allclose(
        float(tot),
        2.0 * float(got["loss_l"]) + float(got["loss_c"])
        + float(got["loss_landm"]),
        rtol=1e-6,
    )


def test_diou_mode_runs_and_is_positive(rng):
    priors, preds, _, targets = _make_problem(rng)
    got = losses.multibox_loss(
        tuple(jnp.asarray(p) for p in preds),
        jnp.asarray(priors),
        targets,
        box_loss="diou",
    )
    assert float(got["loss_l"]) > 0.0
    assert np.isfinite(float(got["loss_l"]))


def test_loss_gradient_finite(rng):
    import jax

    priors, preds, _, targets = _make_problem(rng)

    def f(loc, conf, landm):
        out = losses.multibox_loss(
            (loc, conf, landm), jnp.asarray(priors), targets
        )
        return losses.total_loss(out)

    grads = jax.grad(f, argnums=(0, 1, 2))(
        *(jnp.asarray(p) for p in preds)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
