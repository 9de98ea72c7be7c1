"""Detect->align->embed->identify pipeline (jabd_tpu/pipeline.py +
recognition/align.py).

The reference never connects its detector to its recognizer (the
recognition evals read externally-aligned crops,
validation_lq/tinyface_helper.py:18); these tests cover the joining
machinery: Umeyama similarity estimation, ArcFace-template alignment,
fixed-batch embedding, gallery cosine matching, and the CLI journey.
"""

import os

import numpy as np
import pytest

from jabd_tpu.recognition.align import (
    ARCFACE_TEMPLATE,
    align_face,
    align_from_detections,
    similarity_transform,
)


def _apply(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


class TestSimilarityTransform:
    def test_recovers_known_transform(self):
        rng = np.random.default_rng(0)
        src = rng.uniform(0, 100, (5, 2))
        theta, scale, t = 0.37, 1.8, np.array([12.0, -7.5])
        rot = np.array(
            [
                [np.cos(theta), -np.sin(theta)],
                [np.sin(theta), np.cos(theta)],
            ]
        )
        dst = scale * src @ rot.T + t
        m = similarity_transform(src, dst)
        np.testing.assert_allclose(_apply(m, src), dst, atol=1e-4)
        # The linear part is a scaled rotation: columns orthogonal,
        # equal norm `scale`, positive determinant (no reflection).
        lin = m[:, :2]
        np.testing.assert_allclose(
            lin.T @ lin, scale**2 * np.eye(2), atol=1e-4
        )
        assert np.linalg.det(lin) > 0

    def test_identity_when_src_is_template(self):
        m = similarity_transform(ARCFACE_TEMPLATE, ARCFACE_TEMPLATE)
        np.testing.assert_allclose(
            m, np.array([[1, 0, 0], [0, 1, 0]], np.float32), atol=1e-5
        )

    def test_least_squares_under_noise(self):
        # With noisy correspondences the estimate still minimizes
        # squared error: it must beat the identity map on residuals.
        rng = np.random.default_rng(1)
        src = ARCFACE_TEMPLATE + rng.normal(0, 2.0, (5, 2))
        dst = ARCFACE_TEMPLATE
        m = similarity_transform(src, dst)
        res = np.sum((_apply(m, src) - dst) ** 2)
        assert res < np.sum((src - dst) ** 2)

    def test_no_reflection_even_when_flipped(self):
        # A mirrored source tempts the unconstrained LSQ into a
        # reflection; Umeyama's determinant correction forbids it.
        src = ARCFACE_TEMPLATE * np.array([-1.0, 1.0])
        m = similarity_transform(src, ARCFACE_TEMPLATE)
        assert np.linalg.det(m[:, :2]) > 0


class TestAlignFace:
    def test_template_landmarks_identity_crop(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (200, 200, 3), np.uint8)
        out = align_face(img, ARCFACE_TEMPLATE, size=112)
        np.testing.assert_array_equal(out, img[:112, :112])

    def test_shifted_landmarks_shift_crop(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (300, 300, 3), np.uint8)
        shift = np.array([40.0, 25.0])
        out = align_face(img, ARCFACE_TEMPLATE + shift, size=112)
        np.testing.assert_array_equal(
            out, img[25 : 25 + 112, 40 : 40 + 112]
        )

    def test_scaled_output_size(self):
        img = np.zeros((100, 100, 3), np.uint8)
        out = align_face(img, ARCFACE_TEMPLATE, size=56)
        assert out.shape == (56, 56, 3)

    def test_align_from_detections(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 255, (200, 200, 3), np.uint8)
        det = np.zeros((15,), np.float32)
        det[:4] = [30, 40, 150, 160]
        det[4] = 0.9
        det[5:15] = ARCFACE_TEMPLATE.ravel()
        crops = align_from_detections(img, np.stack([det, det]))
        assert crops.shape == (2, 112, 112, 3)
        np.testing.assert_array_equal(crops[0], img[:112, :112])

    def test_empty_detections(self):
        img = np.zeros((50, 50, 3), np.uint8)
        crops = align_from_detections(img, np.zeros((0, 15), np.float32))
        assert crops.shape == (0, 112, 112, 3)


class _FakeEmbedder:
    """Deterministic stand-in: embedding = normalized per-channel means
    (jit-able, batch-size independent) — lets the batching/padding logic
    be checked exactly without a real IR compile."""

    embedding_size = 6

    def apply(self, variables, x, train=False):
        import jax.numpy as jnp

        v = jnp.mean(x, axis=(1, 2))  # [B,3]
        emb = jnp.concatenate([v, -v], axis=1)  # [B,6]
        n = jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-8
        return emb / n, n


class _FakeDetector:
    def __init__(self, dets):
        self._dets = dets

    def detect_image(self, image):
        return self._dets


class TestFacePipeline:
    def _pipe(self, dets=None):
        from jabd_tpu.pipeline import FacePipeline

        return FacePipeline(
            _FakeDetector(
                dets if dets is not None else np.zeros((0, 15), np.float32)
            ),
            _FakeEmbedder(),
            {},
            embed_batch=2,
        )

    def test_embed_crops_padding_exact(self):
        # 5 crops through batch-2 chunks: the tail is padded; results
        # must equal the unpadded per-crop computation.
        rng = np.random.default_rng(5)
        crops = rng.integers(0, 255, (5, 112, 112, 3), np.uint8)
        pipe = self._pipe()
        got = pipe.embed_crops(crops)
        assert got.shape == (5, 6)
        x = (crops[:, :, :, ::-1].astype(np.float32) / 255 - 0.5) / 0.5
        v = x.mean(axis=(1, 2))
        want = np.concatenate([v, -v], axis=1)
        want /= np.linalg.norm(want, axis=1, keepdims=True) + 1e-8
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_embed_no_crops(self):
        assert self._pipe().embed_crops(
            np.zeros((0, 112, 112, 3), np.uint8)
        ).shape == (0, 6)

    def test_analyze_shapes(self):
        det = np.zeros((15,), np.float32)
        det[:4] = [10, 10, 120, 120]
        det[4] = 0.8
        det[5:15] = ARCFACE_TEMPLATE.ravel() + 10
        pipe = self._pipe(np.stack([det]))
        img = np.random.default_rng(6).integers(
            0, 255, (160, 160, 3), np.uint8
        )
        dets, embs = pipe.analyze(img)
        assert dets.shape == (1, 15) and embs.shape == (1, 6)
        np.testing.assert_allclose(np.linalg.norm(embs[0]), 1.0, atol=1e-5)


class TestGallery:
    def test_enroll_match_threshold(self):
        from jabd_tpu.pipeline import Gallery

        g = Gallery()
        a = np.eye(4, dtype=np.float32)[0]
        b = np.eye(4, dtype=np.float32)[1]
        g.enroll("ann", a)
        g.enroll("bob", np.stack([b, b]))  # multi-photo mean
        assert g.match(a) == [("ann", 1.0)]
        name, sim = g.match(b)[0]
        assert name == "bob" and sim == pytest.approx(1.0)
        # Orthogonal query falls below threshold -> unknown.
        q = np.eye(4, dtype=np.float32)[2]
        assert g.match(q, threshold=0.3)[0][0] is None

    def test_mean_fusion_renormalized(self):
        from jabd_tpu.pipeline import Gallery

        g = Gallery()
        e1 = np.array([1.0, 0, 0, 0], np.float32)
        e2 = np.array([0, 1.0, 0, 0], np.float32)
        g.enroll("x", np.stack([e1, e2]))
        np.testing.assert_allclose(np.linalg.norm(g.matrix[0]), 1.0,
                                   atol=1e-6)

    def test_save_load_roundtrip(self, tmp_path):
        from jabd_tpu.pipeline import Gallery

        g = Gallery()
        g.enroll("ann", np.array([1.0, 0, 0], np.float32))
        p = str(tmp_path / "g.npz")
        g.save(p)
        g2 = Gallery.load(p)
        assert g2.names == ["ann"]
        np.testing.assert_allclose(g2.matrix, g.matrix)

    def test_empty_gallery(self):
        from jabd_tpu.pipeline import Gallery

        assert Gallery().match(np.ones((1, 4), np.float32)) == [
            (None, -1.0)
        ]


@pytest.mark.slow
def test_cli_identify_journey(tmp_path):
    """Full CLI drive with REAL models (mnet025 detector at 64², ir_18
    embedder): enroll a 2-identity gallery tree, save the npz, identify
    a probe image, write the annotated output. Random weights — the
    assertion is the journey executing and artifacts landing, plus the
    gallery npz reload path."""
    import cv2

    from jabd_tpu import cli

    rng = np.random.default_rng(7)

    def face_img(seed):
        r = np.random.default_rng(seed)
        img = r.integers(40, 90, (120, 120, 3)).astype(np.uint8)
        img[30:90, 30:90] = r.integers(150, 230, (60, 60, 3)).astype(
            np.uint8
        )
        return img

    gal = tmp_path / "gallery"
    for name, seed in [("ann", 1), ("bob", 2)]:
        d = gal / name
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "a.jpg"), face_img(seed))
    probe = tmp_path / "probe.jpg"
    cv2.imwrite(str(probe), face_img(1))

    out = tmp_path / "out.jpg"
    npz = tmp_path / "g.npz"
    base = [
        "identify",
        "--model", "retinaface_mnet025",
        "--input-size", "64",
        "--confidence", "0.01",
        "--arch", "ir_18",
        "--image", str(probe),
        "--gallery", str(npz),
        "--out", str(out),
    ]
    cli.main(base + ["--gallery-dir", str(gal)])
    assert out.exists() and npz.exists()
    # Second run loads the saved npz instead of re-enrolling.
    cli.main(base)
