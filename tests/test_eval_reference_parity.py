"""Function-level parity of our WIDER evaluator against the REFERENCE
implementation itself (utils/utils_map.py imported read-only from
/root/reference — torch-free module). Skipped when the reference tree
isn't mounted."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from jabd_tpu.eval import wider_eval as W

REF = "/root/reference/JABD2080ti/utils/utils_map.py"


@pytest.fixture(scope="module")
def ref_map():
    if not os.path.exists(REF):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_utils_map", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand_case(rng, n_pred=25, n_gt=8):
    # xywh boxes in a 200x200 image; predictions sorted by score desc.
    gt = np.concatenate(
        [rng.uniform(0, 150, (n_gt, 2)), rng.uniform(5, 50, (n_gt, 2))], 1
    )
    pred = np.concatenate(
        [
            rng.uniform(0, 150, (n_pred, 2)),
            rng.uniform(5, 50, (n_pred, 2)),
            np.sort(rng.uniform(0, 1, (n_pred, 1)), axis=0)[::-1],
        ],
        1,
    )
    ignore = (rng.random(n_gt) > 0.3).astype(float)
    return pred, gt, ignore


def test_image_eval_parity(ref_map, rng):
    for _ in range(10):
        pred, gt, ignore = _rand_case(rng)
        want_recall, want_prop = ref_map.image_eval(
            pred.copy(), gt.copy(), ignore, 0.4
        )
        got_recall, got_prop = W.image_eval(pred, gt, ignore, 0.4)
        np.testing.assert_array_equal(got_recall, want_recall)
        np.testing.assert_array_equal(got_prop, want_prop)


def test_img_pr_info_parity(ref_map, rng):
    for _ in range(5):
        pred, gt, ignore = _rand_case(rng)
        pr, pl = W.image_eval(pred, gt, ignore, 0.4)
        want = ref_map.img_pr_info(1000, pred, pl, pr)
        got = W.img_pr_info(1000, pred, pl, pr)
        np.testing.assert_allclose(got, want)


def test_voc_ap_parity(ref_map, rng):
    for _ in range(5):
        rec = np.sort(rng.uniform(0, 1, 50))
        prec = rng.uniform(0, 1, 50)
        np.testing.assert_allclose(
            W.voc_ap(rec, prec), ref_map.voc_ap(rec.copy(), prec.copy())
        )


def test_dataset_pr_and_norm_score_parity(ref_map, rng):
    pr_curve = rng.uniform(1, 100, (1000, 2))
    pr_curve[:, 1] = np.minimum(pr_curve[:, 0], pr_curve[:, 1])
    want = ref_map.dataset_pr_info(1000, pr_curve.copy(), 500)
    # ours folds dataset_pr_info into evaluate_wider; replicate inline:
    got = np.stack(
        [pr_curve[:, 1] / pr_curve[:, 0], pr_curve[:, 1] / 500], axis=1
    )
    np.testing.assert_allclose(got, want)

    pred = {
        "e": {
            "a": np.asarray([[0, 0, 1, 1, 0.3], [0, 0, 1, 1, 0.9]]),
            "b": np.asarray([[0, 0, 1, 1, 0.5]]),
        }
    }
    import copy

    p1 = copy.deepcopy(pred)
    p2 = copy.deepcopy(pred)
    ref_map.norm_score(p1)
    W.norm_score(p2)
    for img in ("a", "b"):
        np.testing.assert_allclose(p2["e"][img], p1["e"][img])
