"""IJB-S and TinyFace protocol tests on synthetic data."""

import numpy as np
import pytest

from jabd_tpu.recognition import ijbs
from jabd_tpu.recognition import tinyface as TF


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _subject_features(rng, n_subjects, dim=32, per=3, noise=0.02):
    protos = _unit(rng.normal(0, 1, (n_subjects, dim)))
    feats, groups = [], {}
    row = 0
    for s in range(n_subjects):
        groups[s] = list(range(row, row + per))
        for _ in range(per):
            feats.append(_unit(protos[s] + rng.normal(0, noise, dim)))
            row += 1
    return np.asarray(feats, np.float32), groups, protos


def test_template_aggregation_normalized(rng):
    feats, groups, _ = _subject_features(rng, 4)
    t = ijbs.build_templates(feats, groups)
    assert len(t) == 4
    for tpl in t:
        np.testing.assert_allclose(np.linalg.norm(tpl.feature), 1.0,
                                   rtol=1e-5)


def test_ijbs_identification_perfect(rng):
    # Real IJB-S galleries each hold HALF the subjects, so each gallery
    # has non-mate probes for the open-set measure.
    feats, groups, protos = _subject_features(rng, 8)
    probes = ijbs.build_templates(feats, groups)
    g1 = [ijbs.Template(subject_id=s, feature=protos[s]) for s in range(4)]
    g2 = [
        ijbs.Template(
            subject_id=s,
            feature=_unit(protos[s] + rng.normal(0, 0.01, 32)),
        )
        for s in range(4, 8)
    ]
    closed, open_ = ijbs.identification(probes, g1, g2)
    assert closed.shape == (3,)  # ranks 1, 5, 10
    assert closed[0] == pytest.approx(1.0)
    assert open_.shape == (2,)  # FARs 0.01, 0.1


def test_ijbs_protocol_driver(rng):
    feats, groups, protos = _subject_features(rng, 6)
    probes = ijbs.build_templates(feats, groups)
    gal = [ijbs.Template(subject_id=s, feature=protos[s]) for s in range(6)]
    test = ijbs.IJBSTest(
        {
            "video2image_probe": probes,
            "single_image_gallery1": gal[:3],
            "single_image_gallery2": gal[3:],
            "booking_image_gallery1": gal[:3],
            "booking_image_gallery2": gal[3:],
        }
    )
    out = test.run_all()
    assert "surveillance_to_single" in out
    assert "surveillance_to_booking" in out
    closed, _ = out["surveillance_to_single"]
    assert closed[0] == pytest.approx(1.0)


def test_tinyface_label_from_path():
    assert TF.label_from_path("/x/y/123_probe_01.jpg") == 123


def test_tinyface_identification_logic(rng):
    """Exercise the protocol math without the on-disk .mat structure."""
    dim = 16
    protos = _unit(rng.normal(0, 1, (5, dim)))
    probe_feats = _unit(protos + rng.normal(0, 0.02, (5, dim)))
    distractors = _unit(rng.normal(0, 1, (20, dim)))
    feats = np.concatenate([probe_feats, protos, distractors]).astype(
        np.float32
    )

    t = TF.TinyFaceTest.__new__(TF.TinyFaceTest)
    t.probe_paths = [f"{i}_p.jpg" for i in range(5)]
    t.gallery_paths = [f"{i}_g.jpg" for i in range(5)]
    t.distractor_paths = [f"d{i}.jpg" for i in range(20)]
    t.image_paths = t.probe_paths + t.gallery_paths + t.distractor_paths
    t._init_proto()
    res = t.test_identification(feats, ranks=(1, 5))
    assert res[1] == pytest.approx(1.0)
    assert res[5] >= res[1]
