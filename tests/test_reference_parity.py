"""Parity against the REFERENCE implementation itself, imported read-only
from /root/reference (torch CPU): anchor generation, letterbox,
preprocess, and the full MultiBoxLoss (per-image matching + hard-negative
mining). Skipped when the reference tree isn't mounted."""

import importlib.util
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REF_ROOT = "/root/reference/JABD2080ti"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not mounted"
)


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, rel)
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    return {
        "anchors": _load("ref_anchors", "utils/anchors.py"),
        "training": _load("ref_training", "nets/retinaface_training.py"),
        "utils": _load("ref_utils", "utils/utils.py"),
        "torch": torch,
    }


def test_anchor_values_match_reference(ref):
    from jabd_tpu import configs
    from jabd_tpu.ops import anchors as A

    for preset, size in [
        ("mnet", (840, 840)),
        ("mnet", (1280, 1280)),
        ("re50_self", (840, 840)),
        ("mnet_4", (640, 640)),
    ]:
        cfg = configs.ANCHOR_PRESETS[preset]
        ref_cfg = {
            "min_sizes": [list(m) for m in cfg.min_sizes],
            "steps": list(cfg.steps),
            "clip": cfg.clip,
        }
        want = (
            ref["anchors"].Anchors(ref_cfg, image_size=size)
            .get_anchors()
            .numpy()
        )
        got = A.generate_anchors(cfg, size)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_letterbox_and_preprocess_match_reference(ref, rng):
    from jabd_tpu.ops import image as I

    img = rng.integers(0, 255, (97, 133, 3), dtype=np.uint8)
    # uint8 in, like the reference pipeline: byte-exact.
    want = ref["utils"].letterbox_image(img, (160, 120))
    got = I.letterbox_np(img, (160, 120))
    np.testing.assert_array_equal(got, want)

    x = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    want_p = ref["utils"].preprocess_input(x.copy())
    got_p = I.preprocess_input_np(x)
    np.testing.assert_allclose(got_p, want_p, atol=1e-5)


def test_multibox_loss_matches_reference(ref, rng):
    """The decisive loss test: reference MultiBoxLoss (per-image CPU match
    loop, index_fill force-match, sort-rank mining) vs our dense vmapped
    version, on identical random inputs."""
    torch = ref["torch"]
    from jabd_tpu import configs, losses
    from jabd_tpu.ops import anchors as A
    from tests.conftest import random_boxes

    cfg = configs.AnchorConfig(
        min_sizes=((16, 32), (64, 128)), steps=(16, 32)
    )
    priors = A.generate_anchors(cfg, (256, 256))
    P = priors.shape[0]
    bsz, gts = 3, (2, 5, 9)

    loc = rng.normal(0, 0.5, (bsz, P, 4)).astype(np.float32)
    conf = rng.normal(0, 1, (bsz, P, 2)).astype(np.float32)
    landm = rng.normal(0, 0.5, (bsz, P, 10)).astype(np.float32)

    tlist = []
    gmax = max(gts)
    boxes = np.zeros((bsz, gmax, 4), np.float32)
    labels = np.zeros((bsz, gmax), np.float32)
    landms_t = np.zeros((bsz, gmax, 10), np.float32)
    valid = np.zeros((bsz, gmax), bool)
    for i, g in enumerate(gts):
        t = random_boxes(rng, g)
        lb = rng.choice([1.0, -1.0], size=(g,)).astype(np.float32)
        lm = rng.uniform(0, 1, (g, 10)).astype(np.float32)
        lm[lb == -1] = 0.0
        row = np.concatenate([t, lm, lb[:, None]], 1)  # [g, 15]
        tlist.append(torch.from_numpy(row))
        boxes[i, :g], labels[i, :g], landms_t[i, :g] = t, lb, lm
        valid[i, :g] = True

    criterion = ref["training"].MultiBoxLoss(
        2, 0.35, 7, [0.1, 0.2], cuda=False
    )
    with torch.no_grad():
        want_l, want_c, want_landm = criterion(
            (
                torch.from_numpy(loc),
                torch.from_numpy(conf),
                torch.from_numpy(landm),
            ),
            torch.from_numpy(priors.copy()),
            tlist,
        )

    got = losses.multibox_loss(
        (jnp.asarray(loc), jnp.asarray(conf), jnp.asarray(landm)),
        jnp.asarray(priors),
        losses.Targets(
            boxes=jnp.asarray(boxes),
            labels=jnp.asarray(labels),
            landms=jnp.asarray(landms_t),
            valid=jnp.asarray(valid),
        ),
        overlap_threshold=0.35,
        neg_pos_ratio=7,
        variances=(0.1, 0.2),
    )
    np.testing.assert_allclose(
        float(got["loss_l"]), float(want_l), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(got["loss_c"]), float(want_c), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(got["loss_landm"]), float(want_landm), rtol=2e-3
    )


def test_diou_multibox_loss_matches_reference(ref, rng):
    """DIoU variant: reference retinaface_training_DIOU.MultiBoxLoss
    (match_iou keeps raw boxes; IouLoss decodes preds and sums 1-DIoU)
    vs our box_loss='diou' path."""
    torch = ref["torch"]
    import jax.numpy as jnp

    from jabd_tpu import configs, losses
    from jabd_tpu.ops import anchors as A
    from tests.conftest import random_boxes

    ref_diou = _load(
        "ref_training_diou", "nets/retinaface_training_DIOU.py"
    )
    cfg = configs.AnchorConfig(
        min_sizes=((16, 32), (64, 128)), steps=(16, 32)
    )
    priors = A.generate_anchors(cfg, (192, 192))
    P = priors.shape[0]
    bsz, gts = 2, (3, 6)
    loc = rng.normal(0, 0.3, (bsz, P, 4)).astype(np.float32)
    conf = rng.normal(0, 1, (bsz, P, 2)).astype(np.float32)
    landm = rng.normal(0, 0.5, (bsz, P, 10)).astype(np.float32)

    tlist = []
    gmax = max(gts)
    boxes = np.zeros((bsz, gmax, 4), np.float32)
    labels = np.zeros((bsz, gmax), np.float32)
    landms_t = np.zeros((bsz, gmax, 10), np.float32)
    valid = np.zeros((bsz, gmax), bool)
    for i, g in enumerate(gts):
        t = random_boxes(rng, g)
        lb = np.ones((g,), np.float32)
        lm = rng.uniform(0, 1, (g, 10)).astype(np.float32)
        tlist.append(
            torch.from_numpy(np.concatenate([t, lm, lb[:, None]], 1))
        )
        boxes[i, :g], labels[i, :g], landms_t[i, :g] = t, lb, lm
        valid[i, :g] = True

    criterion = ref_diou.MultiBoxLoss(2, 0.35, 7, [0.1, 0.2], cuda=False)
    with torch.no_grad():
        want_l, want_c, want_landm = criterion(
            (
                torch.from_numpy(loc),
                torch.from_numpy(conf),
                torch.from_numpy(landm),
            ),
            torch.from_numpy(priors.copy()),
            tlist,
        )
    got = losses.multibox_loss(
        (jnp.asarray(loc), jnp.asarray(conf), jnp.asarray(landm)),
        jnp.asarray(priors),
        losses.Targets(
            boxes=jnp.asarray(boxes),
            labels=jnp.asarray(labels),
            landms=jnp.asarray(landms_t),
            valid=jnp.asarray(valid),
        ),
        box_loss="diou",
    )
    np.testing.assert_allclose(float(got["loss_l"]), float(want_l), rtol=5e-3)
    np.testing.assert_allclose(float(got["loss_c"]), float(want_c), rtol=2e-3)
    np.testing.assert_allclose(
        float(got["loss_landm"]), float(want_landm), rtol=2e-3
    )


def test_iou_family_matches_reference_box_utils(ref, rng):
    """Pairwise IoU/GIoU matrices vs utils/box_utils.py (the reference's
    standalone IoU library)."""
    torch = ref["torch"]
    import jax.numpy as jnp

    from jabd_tpu.ops import boxes as B
    from tests.conftest import random_boxes

    bu = _load("ref_box_utils", "utils/box_utils.py")
    a = random_boxes(rng, 12)
    b = random_boxes(rng, 12)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    for kind, fn in [("iou", bu.bbox_overlaps_iou),
                     ("giou", bu.bbox_overlaps_giou)]:
        want = fn(ta, tb).numpy()
        got = np.asarray(
            B.iou_pairwise_general(jnp.asarray(a), jnp.asarray(b), kind)
        )
        # reference bbox_overlaps_* are ELEMENTWISE (diagonal of pairwise)
        if want.ndim == 1:
            got = got.diagonal()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
