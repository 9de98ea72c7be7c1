"""Device-side recognition augmentation parity vs the host pixel path.

The host path (recognition/data.py `augment_face` + flip +
`normalize_face`) is itself the reference recipe (data.py:217-260); the
device path must reproduce it from the SAME rng stream. Exact equality
is asserted whenever no low-res draw fires (every op is then
bit-reproducible in f32); low-res draws differ only by cv2's
intermediate uint8 quantization, which the composed float matrix skips.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from jabd_tpu.recognition import data as D  # noqa: E402
from jabd_tpu.recognition import device_augment as FDA  # noqa: E402


def _rand_face(rng, size=112):
    # Smooth-ish content: random low-res field upsampled, plus noise —
    # more representative of faces than white noise for resample error.
    import cv2

    base = rng.integers(0, 255, (14, 14, 3), np.uint8)
    img = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    noise = rng.integers(0, 20, (size, size, 3), np.uint8)
    return cv2.add(img, noise)


@pytest.mark.parametrize("interp", [0, 1, 2, 3, 4])
def test_cv2_matrix_extraction_matches_cv2(interp, rng):
    """The identity-resize extraction reproduces cv2.resize float
    semantics for every interpolation mode, both directions."""
    import cv2

    for in_size, out_size in [(112, 37), (37, 112), (112, 90), (22, 112)]:
        img = rng.uniform(0, 255, (in_size, in_size, 3)).astype(np.float32)
        want = cv2.resize(
            img, (out_size, out_size), interpolation=interp
        )
        m = FDA.cv2_resize_matrix(in_size, out_size, interp)
        got = np.einsum("oh,hwc->owc", m, img)
        got = np.einsum("ow,hwc->hoc", m, got)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-2)


def test_device_matches_host_exact_without_lowres():
    """Crop/flip-only draws are EXACTLY equal (pure masking/permutation);
    photometric draws may differ by <=1 uint8 LSB on a handful of pixels
    whose truncation boundary sits within float-reduction-order noise of
    the image mean (numpy pairwise sum vs XLA reduction tree)."""
    size = 112
    master = np.random.default_rng(7)
    photo_seen = 0
    for seed in range(40):
        img = _rand_face(master, size)
        r_host = np.random.default_rng(seed)
        r_dev = np.random.default_rng(seed)
        draw = D.draw_face_augment_params(
            r_dev, size, size, crop_prob=0.7, low_res_prob=0.0,
            photometric_prob=0.7,
        )
        flip = r_dev.random() < 0.5

        aug, _ = D.augment_face(
            img, r_host, crop_prob=0.7, low_res_prob=0.0,
            photometric_prob=0.7,
        )
        if r_host.random() < 0.5:
            aug = aug[:, ::-1]
        want = D.normalize_face(aug)

        plan = FDA.stack_face_plans(
            [FDA.plan_face_sample(draw, flip, size)]
        )
        got = np.asarray(
            FDA.device_augment_faces(
                jnp.asarray(img[None]), plan,
                resample_dtype=jnp.float32,
            )[0]
        )
        if draw.photo is None:
            np.testing.assert_array_equal(got, want)
        else:
            photo_seen += 1
            diff = np.abs(got - want)
            lsb = 2 / 255  # one uint8 step on the [-1, 1] scale
            assert diff.max() <= lsb * 1.0001, diff.max()
            assert (diff > 0).mean() < 1e-3, (diff > 0).mean()
    assert photo_seen >= 10


def test_device_matches_host_with_lowres():
    """Full recipe incl. low-res: tolerance covers cv2's intermediate
    uint8 rounding (composed float matrices skip it)."""
    size = 112
    master = np.random.default_rng(3)
    lowres_seen = 0
    for seed in range(30):
        img = _rand_face(master, size)
        r_host = np.random.default_rng(seed)
        r_dev = np.random.default_rng(seed)
        draw = D.draw_face_augment_params(
            r_dev, size, size, crop_prob=0.3, low_res_prob=0.8,
            photometric_prob=0.3,
        )
        flip = r_dev.random() < 0.5
        lowres_seen += draw.lowres is not None

        aug, _ = D.augment_face(
            img, r_host, crop_prob=0.3, low_res_prob=0.8,
            photometric_prob=0.3,
        )
        if r_host.random() < 0.5:
            aug = aug[:, ::-1]
        want = D.normalize_face(aug)

        plan = FDA.stack_face_plans(
            [FDA.plan_face_sample(draw, flip, size)]
        )
        got = np.asarray(
            FDA.device_augment_faces(
                jnp.asarray(img[None]), plan,
                resample_dtype=jnp.float32,
            )[0]
        )
        # [-1, 1] scale: 2/255 per uint8 LSB. Photometric contrast can
        # amplify the intermediate-rounding delta by up to ~2.25x.
        diff = np.abs(got - want)
        assert diff.mean() < 3.0 * (2 / 255), diff.mean()
        assert np.quantile(diff, 0.99) <= 8 * (2 / 255), (
            seed, np.quantile(diff, 0.99))
    assert lowres_seen >= 15  # the tolerance path was actually exercised


@pytest.mark.slow  # compiles ir_18 + AdaFace head
def test_loader_and_fused_step_run():
    """device_face_train_loader + make_train_step_aug end-to-end on a
    tiny tree: shapes, labels, and a finite decreasing-capable loss."""
    import os
    import tempfile

    import cv2

    from jabd_tpu.recognition import build_head, build_model
    from jabd_tpu.recognition import train as RT

    size = 112
    with tempfile.TemporaryDirectory() as root:
        rng = np.random.default_rng(0)
        for cls in ("a", "b"):
            os.makedirs(os.path.join(root, cls))
            for i in range(4):
                cv2.imwrite(
                    os.path.join(root, cls, f"{i}.jpg"),
                    _rand_face(rng, size),
                )
        ds = D.ImageFolderDataset(root)
        batches = list(FDA.device_face_train_loader(ds, 4, seed=0))
        assert len(batches) == 2
        images_u8, plan, labels = batches[0]
        assert images_u8.shape == (4, size, size, 3)
        assert images_u8.dtype == np.uint8
        assert plan.mv.shape == (4, size, size)
        assert labels.shape == (4,)

        model = build_model("ir_18")
        head = build_head("adaface", class_num=ds.num_classes)
        state = RT.create_state(
            jax.random.PRNGKey(0), model, head, num_train_steps_hint=4,
            lr=0.01, milestones=(10,),
        )
        step = RT.make_train_step_aug(model, head)
        state, m = step(
            state, jnp.asarray(images_u8), plan, jnp.asarray(labels),
            jax.random.PRNGKey(1),
        )
        assert np.isfinite(float(m["loss"]))


def test_loader_matches_host_loader_augmentations():
    """The device loader's rng streams equal the host loader's: same
    permutation, same per-sample draws -> same augmented tensors (up to
    the low-res tolerance)."""
    import os
    import tempfile

    import cv2

    with tempfile.TemporaryDirectory() as root:
        rng = np.random.default_rng(1)
        for cls in ("x", "y"):
            os.makedirs(os.path.join(root, cls))
            for i in range(3):
                cv2.imwrite(
                    os.path.join(root, cls, f"{i}.jpg"),
                    _rand_face(rng, 112),
                )
        ds = D.ImageFolderDataset(root)
        host = list(D.recognition_train_loader(ds, 3, seed=5))
        dev = list(
            FDA.device_face_train_loader(
                ds, 3, seed=5, matrix_dtype=np.float32
            )
        )
        assert len(host) == len(dev) == 2
        for (h_img, h_lab), (d_u8, d_plan, d_lab) in zip(host, dev):
            np.testing.assert_array_equal(h_lab, d_lab)
            got = np.asarray(
                FDA.device_augment_faces(
                    jnp.asarray(d_u8), d_plan,
                    resample_dtype=jnp.float32,
                )
            )
            assert np.abs(got - h_img).mean() < 3.0 * (2 / 255)


def test_color_jitter_matches_pil_imageenhance():
    """The host photometric (data.color_jitter_pil — the reference's
    ColorJitter via PIL F.adjust_*, data.py:248-258) must be BYTE-EXACT
    to PIL's own ImageEnhance chain for every op order and factors on
    both sides of 1 (PIL truncates blends; gray is ITU-R 601 luma, NOT
    an unweighted channel mean; contrast anchors on the L-image's
    rounded mean)."""
    import itertools

    from PIL import Image, ImageEnhance

    rng = np.random.default_rng(11)
    img = _rand_face(rng)
    for order in itertools.permutations((0, 1, 2)):
        f = tuple(float(x) for x in rng.uniform(0.5, 1.5, 3))
        want = Image.fromarray(img, "RGB")
        for op in order:
            if op == 0:
                want = ImageEnhance.Brightness(want).enhance(f[0])
            elif op == 1:
                want = ImageEnhance.Contrast(want).enhance(f[1])
            else:
                want = ImageEnhance.Color(want).enhance(f[2])
        got = D.color_jitter_pil(img, f, order)
        np.testing.assert_array_equal(got, np.asarray(want)), order
