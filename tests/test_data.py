"""Data pipeline tests on a synthetic WIDER-format tree."""

import numpy as np
import pytest

from jabd_tpu.data import wider as D


LABEL_TXT = """# img_0.jpg
10 10 30 40 15.0 20.0 0.0 25.0 20.0 0.0 20.0 28.0 0.0 16.0 35.0 0.0 26.0 35.0 0.0 0.9
50 60 20 20 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 -1.0 0.8
# img_1.jpg
5 5 10 12 7.0 8.0 0.0 12.0 8.0 0.0 9.0 11.0 0.0 8.0 14.0 0.0 12.0 14.0 0.0 1.0
"""


@pytest.fixture
def wider_tree(tmp_path):
    from PIL import Image

    root = tmp_path / "train"
    (root / "images").mkdir(parents=True)
    (root / "label.txt").write_text(LABEL_TXT)
    rng = np.random.default_rng(0)
    for name, size in [("img_0.jpg", (120, 100)), ("img_1.jpg", (64, 48))]:
        arr = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "images" / name)
    return str(root / "label.txt")


def test_parse_labels(wider_tree):
    paths, annos = D.parse_wider_labels(wider_tree)
    assert len(paths) == 2 and len(annos) == 2
    a = annos[0]
    assert a.shape == (2, 15)
    # x2 = x + w, y2 = y + h
    np.testing.assert_allclose(a[0, :4], [10, 10, 40, 50])
    # landmark columns skip visibility flags
    np.testing.assert_allclose(a[0, 4:6], [15.0, 20.0])
    assert a[0, 14] == 1.0  # has landmarks
    assert a[1, 14] == -1.0  # no landmarks (lx < 0)


def test_augment_sample_invariants(wider_tree):
    from PIL import Image

    paths, annos = D.parse_wider_labels(wider_tree)
    img = Image.open(paths[0]).convert("RGB")
    rng = np.random.default_rng(3)
    for _ in range(5):
        out, box = D.augment_sample(img, annos[0], 128, rng)
        assert out.shape == (128, 128, 3)
        assert out.dtype == np.float32
        if len(box):
            assert box[:, :14].min() >= 0.0
            assert box[:, :14].max() <= 1.0 + 1e-6
            # no-landmark rows have zeroed landmark cols
            nl = box[box[:, 14] == -1]
            if len(nl):
                np.testing.assert_allclose(nl[:, 4:14], 0.0)


class _LegacyNPRandom:
    """Duck-typed rng that replays numpy's LEGACY global stream — lets
    augment_sample consume the exact same draws as the reference's
    `self.rand` (utils/dataloader.py:68-69: np.random.rand) and
    np.random.shuffle."""

    def random(self):
        return np.random.rand()

    def shuffle(self, x):
        np.random.shuffle(x)


def test_augment_byte_parity_vs_reference():
    """Seeded byte-level parity of the FULL augmentation (geometry + HSV)
    against the reference's own get_random_data — closes ROADMAP round-1
    gap #9 (only letterbox/labels had byte parity before). The single
    intentional deviation is the upper box clip (the reference's is a
    fancy-index no-op, PARITY.md), so reference boxes are min-clipped
    before comparing."""
    import importlib
    import os
    import sys

    ref_root = "/root/reference/JABD2080ti"
    if not os.path.isfile(os.path.join(ref_root, "utils/dataloader.py")):
        pytest.skip("reference tree not mounted")
    pytest.importorskip("torch")
    from PIL import Image

    sys.path.insert(0, ref_root)
    try:
        mod = importlib.import_module("utils.dataloader")
    finally:
        sys.path.remove(ref_root)
    dg = mod.DataGenerator.__new__(mod.DataGenerator)  # skip file __init__

    base = np.random.default_rng(0)
    img = Image.fromarray(
        base.integers(0, 255, (73, 97, 3), dtype=np.uint8), "RGB"
    )
    box0 = np.zeros((4, 15), np.float32)
    cxy = base.uniform(10, 60, (4, 2))
    wh = base.uniform(5, 25, (4, 2))
    box0[:, 0:2] = cxy - wh / 2
    box0[:, 2:4] = cxy + wh / 2
    box0[:, 4:14] = base.uniform(10, 60, (4, 10))
    box0[:, 14] = [1, -1, 1, -1]

    xs, ys = [0, 2, 4, 6, 8, 10, 12], [1, 3, 5, 7, 9, 11, 13]
    for seed in range(8):  # covers flip on/off, upscale/downscale
        np.random.seed(seed)
        ref_img, ref_box = dg.get_random_data(
            img, box0.copy(), [128, 128]
        )
        np.random.seed(seed)
        our_img, our_box = D.augment_sample(
            img, box0.copy(), 128, _LegacyNPRandom()
        )
        np.testing.assert_array_equal(our_img, ref_img, err_msg=f"s{seed}")
        ref_box = np.asarray(ref_box, np.float32)
        if len(ref_box):
            ref_box[:, xs] = np.minimum(ref_box[:, xs], 1.0)
            ref_box[:, ys] = np.minimum(ref_box[:, ys], 1.0)
        assert our_box.shape == ref_box.shape, f"s{seed}"
        np.testing.assert_allclose(
            our_box, ref_box, atol=1e-6, err_msg=f"s{seed}"
        )


def test_batch_targets_padding():
    t1 = np.random.rand(3, 15).astype(np.float32)
    t2 = np.random.rand(7, 15).astype(np.float32)
    boxes, labels, landms, valid = D.batch_targets([t1, t2], max_targets=5)
    assert boxes.shape == (2, 5, 4)
    assert valid[0].sum() == 3 and valid[1].sum() == 5  # truncation
    np.testing.assert_allclose(boxes[0, :3], t1[:3, :4])


def test_train_loader_yields_batches(wider_tree):
    ds = D.WiderFaceDataset(wider_tree, input_size=64)
    batches = list(
        D.train_loader(ds, batch_size=2, max_targets=8, num_workers=2)
    )
    assert len(batches) == 1
    images, (boxes, labels, landms, valid) = batches[0]
    assert images.shape == (2, 64, 64, 3)
    assert boxes.shape == (2, 8, 4)
    assert valid.any()
