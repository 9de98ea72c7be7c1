"""WIDER evaluation protocol tests on synthetic data: hand-checked
image_eval cases and an end-to-end AP=1.0 run over fabricated .mat ground
truth (structure of the official wider_face_val.mat)."""

import numpy as np
import pytest

from jabd_tpu.eval import wider_eval as W


def test_image_eval_perfect_match():
    gt = np.asarray([[10, 10, 20, 20], [50, 50, 10, 10]], float)  # xywh
    pred = np.asarray(
        [[10, 10, 20, 20, 0.9], [50, 50, 10, 10, 0.8]], float
    )
    ignore = np.ones(2)
    pred_recall, proposal_list = W.image_eval(pred, gt, ignore, 0.5)
    np.testing.assert_array_equal(pred_recall, [1, 2])
    np.testing.assert_array_equal(proposal_list, [1, 1])


def test_image_eval_ignore_region():
    gt = np.asarray([[10, 10, 20, 20]], float)
    pred = np.asarray([[10, 10, 20, 20, 0.9]], float)
    ignore = np.zeros(1)  # GT is an ignore region
    pred_recall, proposal_list = W.image_eval(pred, gt, ignore, 0.5)
    np.testing.assert_array_equal(pred_recall, [0])
    np.testing.assert_array_equal(proposal_list, [-1])


def test_image_eval_double_detection_counts_once():
    gt = np.asarray([[10, 10, 20, 20]], float)
    pred = np.asarray(
        [[10, 10, 20, 20, 0.9], [11, 11, 20, 20, 0.8]], float
    )
    ignore = np.ones(1)
    pred_recall, _ = W.image_eval(pred, gt, ignore, 0.5)
    np.testing.assert_array_equal(pred_recall, [1, 1])


def test_voc_ap_perfect():
    rec = np.linspace(0.1, 1.0, 10)
    prec = np.ones(10)
    assert W.voc_ap(rec, prec) == pytest.approx(1.0)


def test_norm_score():
    pred = {"e": {"a": np.asarray([[0, 0, 1, 1, 0.2], [0, 0, 1, 1, 0.7]])}}
    W.norm_score(pred)
    np.testing.assert_allclose(pred["e"]["a"][:, -1], [0.0, 1.0])


def _fake_gt_dir(tmp_path, events):
    """Write wider_face_val.mat + easy/medium/hard mats with the official
    nested cell structure for `events` = {event: {img: gt_xywh array}}."""
    from scipy.io import savemat

    e = len(events)
    event_list = np.empty((e, 1), object)
    file_list = np.empty((e, 1), object)
    facebox_list = np.empty((e, 1), object)
    gt_list = np.empty((e, 1), object)
    for i, (event, imgs) in enumerate(events.items()):
        event_list[i, 0] = event
        n = len(imgs)
        files = np.empty((n, 1), object)
        boxes = np.empty((n, 1), object)
        keeps = np.empty((n, 1), object)
        for j, (img, gt) in enumerate(imgs.items()):
            files[j, 0] = img
            boxes[j, 0] = np.asarray(gt, float)
            keeps[j, 0] = np.arange(1, len(gt) + 1).reshape(-1, 1)
        file_list[i, 0] = files
        facebox_list[i, 0] = boxes
        gt_list[i, 0] = keeps
    savemat(
        tmp_path / "wider_face_val.mat",
        {
            "face_bbx_list": facebox_list,
            "event_list": event_list,
            "file_list": file_list,
        },
    )
    for name in ("easy", "medium", "hard"):
        savemat(tmp_path / f"wider_{name}_val.mat", {"gt_list": gt_list})
    return str(tmp_path)


def test_end_to_end_perfect_detector(tmp_path):
    events = {
        "0--Parade": {
            "img_a": [[10, 10, 30, 40], [100, 80, 25, 25]],
            "img_b": [[5, 5, 50, 50]],
        },
        "1--Handshaking": {"img_c": [[20, 20, 40, 30]]},
    }
    gt_dir = _fake_gt_dir(tmp_path, events)
    pred = {
        ev: {
            img: np.asarray(
                [list(b) + [0.9 - 0.05 * k] for k, b in enumerate(gts)],
                float,
            )
            for img, gts in imgs.items()
        }
        for ev, imgs in events.items()
    }
    aps = W.evaluate_wider(pred, gt_dir, iou_thresh=0.4)
    for s in ("easy", "medium", "hard"):
        assert aps[s] == pytest.approx(1.0, abs=1e-6), aps


def test_end_to_end_false_positives_lower_ap(tmp_path):
    events = {"0--Parade": {"img_a": [[10, 10, 30, 40]]}}
    gt_dir = _fake_gt_dir(tmp_path, events)
    pred = {
        "0--Parade": {
            "img_a": np.asarray(
                [[10, 10, 30, 40, 0.6], [200, 200, 30, 30, 0.9]], float
            )
        }
    }
    aps = W.evaluate_wider(pred, gt_dir, iou_thresh=0.4)
    assert 0.0 < aps["easy"] < 1.0


def test_pred_txt_roundtrip(tmp_path):
    d = tmp_path / "preds" / "0--Parade"
    d.mkdir(parents=True)
    (d / "img_a.txt").write_text(
        "0--Parade/img_a.jpg\n2\n10 10 30 40 0.9\n1 2 3 4 0.5\n"
    )
    pred = W.load_pred_dir(str(tmp_path / "preds"))
    assert "0--Parade" in pred and "img_a" in pred["0--Parade"]
    assert pred["0--Parade"]["img_a"].shape == (2, 5)
