"""IJB-S and TinyFace protocol tests on synthetic data."""

import numpy as np
import pytest

from jabd_tpu.recognition import identification as ID
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


@pytest.fixture
def ijbs_proto_tree(tmp_path):
    """A miniature IJB-S cs6 protocol directory: 6 subjects, 5 videos
    (video 100 contains two subjects), UAV probes (one video + one
    still), split galleries (subjects 1-3 in g1, 4-6 in g2)."""
    g = tmp_path / "galleries"
    g.mkdir()

    video_pairs = [
        (1, "videos/100.mp4"),
        (2, "videos/100.mp4"),
        (3, "videos/101.mp4"),
        (4, "videos/102.mp4"),
        (5, "videos/103.mp4"),
        (6, "videos/104.mp4"),
        (2, "videos/105.mp4"),  # second video for subject 2 (multiview)
    ]
    meta = ["subject_id,media"]
    for s, v in video_pairs:
        meta += [f"{s},{v}"] * 2  # duplicate rows: init_proto must dedup
    meta.append("4,img/900.png")  # UAV still's metadata row
    (tmp_path / "cs6_metadata.csv").write_text("\n".join(meta) + "\n")

    probe_videos = [f"videos/10{i}.mp4" for i in range(5)]
    (tmp_path / "cs6_surveillance_to_single-booking_probe.csv").write_text(
        "videos\n" + "\n".join(probe_videos) + "\n"
    )
    (tmp_path / "cs6_surveillance_to_surveillance_probe.csv").write_text(
        "videos\n" + "\n".join(probe_videos + ["videos/105.mp4"]) + "\n"
    )
    (tmp_path / "cs6_uav_to_single-booking_probe.csv").write_text(
        "media\nvideos/101.mp4\nimg/900.png\n"
    )

    def gallery(name, rows):
        (g / name).write_text(
            "idx,subject_id,media\n"
            + "\n".join(f"{i},{s},{m}" for i, (s, m) in enumerate(rows))
            + "\n"
        )

    gallery(
        "cs6_surveillance_to_single_g1.csv",
        [(s, f"img/s{s}.png") for s in (1, 2, 3)],
    )
    gallery(
        "cs6_surveillance_to_single_g2.csv",
        [(s, f"img/s{s}.png") for s in (4, 5, 6)],
    )
    gallery(
        "cs6_surveillance_to_booking_g1.csv",
        [(s, f"img/b{s}_{k}.png") for s in (1, 2, 3) for k in (0, 1)],
    )
    gallery(
        "cs6_surveillance_to_booking_g2.csv",
        [(s, f"img/b{s}_{k}.png") for s in (4, 5, 6) for k in (0, 1)],
    )
    # One gallery template per subject (real video galleries hold one
    # video per subject; duplicate subjects would break DIR_FAR's
    # single-mate-score assumption).
    gallery(
        "cs6_surveillance_to_surveillance_g1.csv",
        [(s, v) for s, v in video_pairs if s <= 3 and v != "videos/105.mp4"],
    )
    gallery(
        "cs6_surveillance_to_surveillance_g2.csv",
        [(s, v) for s, v in video_pairs if s > 3],
    )

    # Aligned-crop feature rows: 2 frames per (subject, video) pair +
    # one crop per gallery/UAV still, named per the reference convention
    # <subject>/videos_<vid>_<frame>.jpg, <subject>/img_<name>.png.
    paths, subjects = [], []
    for s, v in video_pairs:
        vid = v.split("/")[1].split(".")[0]
        for f in range(2):
            paths.append(f"crops/{s}/videos_{vid}_f{f}.jpg")
            subjects.append(s)
    for s in range(1, 7):
        paths.append(f"crops/{s}/img_s{s}.png")
        subjects.append(s)
        for k in (0, 1):
            paths.append(f"crops/{s}/img_b{s}_{k}.png")
            subjects.append(s)
    paths.append("crops/4/img_900.png")
    subjects.append(4)
    return tmp_path, paths, np.asarray(subjects)


def test_ijbs_protocol_loader_end_to_end(ijbs_proto_tree, rng):
    from jabd_tpu.recognition.ijbs_proto import IJBSProtocol

    root, paths, subjects = ijbs_proto_tree
    proto = IJBSProtocol.from_protocol_dir(str(root))

    # Slot structure mirrors init_proto: 7 (subject, video) templates,
    # probes over all 5+1 videos, multiview one-per-subject.
    assert len(proto.slots["video2image_probe"]) == 6  # 5 videos, one dual
    assert len(proto.slots["video2video_probe"]) == 7
    assert len(proto.slots["multiview_video_probe"]) == 6
    assert len(proto.slots["uav_probe"]) == 2
    assert len(proto.slots["single_image_gallery1"]) == 3
    assert len(proto.slots["booking_image_gallery2"]) == 3
    mv2 = next(
        proto.all_templates[i]
        for i in proto.slots["multiview_video_probe"]
        if proto.all_templates[i].subject_id == 2
    )
    assert sorted(mv2.videos) == ["videos/100.mp4", "videos/105.mp4"]

    proto.initialize_indices(paths)
    for i in proto.slots["video2image_probe"]:
        t = proto.all_templates[i]
        assert t.indices is not None and len(t.indices) >= 2

    # Well-separated per-subject features => every protocol at rank1=1.
    protos_f = _unit(rng.normal(0, 1, (7, 48)))
    feats = _unit(
        protos_f[subjects - 1] + rng.normal(0, 0.02, (len(subjects), 48))
    ).astype(np.float32)
    norms = rng.uniform(8, 25, (len(subjects), 1)).astype(np.float32)
    test = proto.build_test(feats, norms)
    out = test.run_all()
    assert set(out) == {
        "surveillance_to_single",
        "surveillance_to_booking",
        "multiview_surveillance_to_booking",
        "surveillance_to_surveillance",
        "uav_surveillance_to_booking",
    }
    for name, (closed, open_) in out.items():
        assert closed[0] == pytest.approx(1.0), name
        assert closed.shape == (3,) and open_.shape == (2,)


def test_ijbs_cli_runs(ijbs_proto_tree, rng, tmp_path, capsys):
    """The `ijbs` CLI subcommand end-to-end on the synthetic tree."""
    import json

    from jabd_tpu.recognition import cli as RC

    root, paths, subjects = ijbs_proto_tree
    protos_f = _unit(rng.normal(0, 1, (7, 48)))
    feats = _unit(
        protos_f[subjects - 1] + rng.normal(0, 0.02, (len(subjects), 48))
    ).astype(np.float32)
    norms = rng.uniform(8, 25, (len(subjects), 1)).astype(np.float32)
    npz = tmp_path / "features.npz"
    np.savez(npz, emb=feats, norm=norms, paths=np.asarray(paths))
    RC.main(
        [
            "ijbs",
            "--features", str(npz),
            "--protocol-dir", str(root),
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["surveillance_to_single"]["rank1"] == pytest.approx(1.0)
    assert "dir_far_0.01" in out["uav_surveillance_to_booking"]


def test_tinyface_label_from_path():
    assert TF.label_from_path("/x/y/123_probe_01.jpg") == 123


def _stacked(rng, b=12, d=16):
    e = rng.normal(0, 1, (2, b, d)).astype(np.float32)
    e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    n = rng.uniform(5, 30, (2, b, 1)).astype(np.float32)
    return e, n


@pytest.mark.parametrize(
    "method", ["average", "norm_weighted_avg", "pre_norm_vector_add"]
)
def test_fusion_unit_norm_methods(rng, method):
    e, n = _stacked(rng)
    fused, fused_norm = ID.fuse_features_with_norm(e, n, method)
    np.testing.assert_allclose(
        np.linalg.norm(fused, axis=1), 1.0, rtol=1e-5
    )
    assert fused_norm.shape == (e.shape[1], 1)


def test_fusion_concat(rng):
    e, n = _stacked(rng)
    fused, fused_norm = ID.fuse_features_with_norm(e, n, "concat")
    assert fused.shape == (e.shape[1], 2 * e.shape[2])
    np.testing.assert_allclose(fused[:, : e.shape[2]], e[0])
    np.testing.assert_allclose(fused_norm, n.mean(0))


def test_fusion_faceness_score(rng):
    """insightface ijb_11.py:296 recipe: sum flip halves, scale by the
    detector score, NO re-normalization."""
    e, n = _stacked(rng)
    scores = rng.uniform(0.3, 1.0, e.shape[1]).astype(np.float32)
    fused, _ = ID.fuse_features_with_norm(
        e, n, "faceness_score", faceness_scores=scores
    )
    np.testing.assert_allclose(
        fused, e.sum(0) * scores[:, None], rtol=1e-6
    )
    with pytest.raises(ValueError):
        ID.fuse_features_with_norm(e, n, "faceness_score")


def test_fusion_no_norms_guards(rng):
    e, _ = _stacked(rng)
    with pytest.raises(AssertionError):
        ID.fuse_features_with_norm(e, None, "norm_weighted_avg")
    fused, fused_norm = ID.fuse_features_with_norm(e, None, "average")
    np.testing.assert_allclose(fused_norm, 1.0)


def test_fusion_parity_vs_reference():
    """Compare against the reference's own fuse_features_with_norm
    (validation_lq/validate_tinyface.py:29-65), imported read-only."""
    import importlib.util
    import os
    import sys

    ref_lq = "/root/reference/JABD2080ti/validation_lq"
    if not os.path.isdir(ref_lq):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_validate_tinyface", os.path.join(ref_lq, "validate_tinyface.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, ref_lq)
    sys.path.insert(0, os.path.dirname(ref_lq))
    # data_utils pulls in torchvision (absent here) and net/tinyface_helper
    # aren't needed by the function under test — stub what's missing.
    import types

    stubbed = []
    for name in ("data_utils", "net"):
        if name not in sys.modules:
            try:
                __import__(name)
            except Exception:
                sys.modules[name] = types.ModuleType(name)
                stubbed.append(name)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(ref_lq)
        sys.path.remove(os.path.dirname(ref_lq))
        for name in stubbed:
            del sys.modules[name]

    rng = np.random.default_rng(7)
    e, n = _stacked(rng)
    for method in ("average", "norm_weighted_avg", "pre_norm_vector_add",
                   "concat"):
        ref_f, ref_n = mod.fuse_features_with_norm(
            torch.from_numpy(e), torch.from_numpy(n), fusion_method=method
        )
        got_f, got_n = ID.fuse_features_with_norm(e, n, method)
        np.testing.assert_allclose(got_f, ref_f.numpy(), atol=1e-6)
        np.testing.assert_allclose(got_n, ref_n.numpy(), atol=1e-6)


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
