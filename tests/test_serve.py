"""Serving daemon (jabd_tpu/serve.py): dynamic batching + HTTP front-end.

Key property: batching must change latency only, never outputs — every
request's result is bit-identical to Predictor.detect_image (same
letterbox -> fused detect -> undo path, batch rows are independent).
"""

import dataclasses
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.predict import Predictor
from jabd_tpu.serve import BatchingDetector, make_server

pytestmark = pytest.mark.slow  # compile-heavy module


@pytest.fixture(scope="module")
def predictor():
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    pcfg = configs.PredictConfig(
        confidence=0.02,
        input_shape=(64, 64),
        max_detections=50,
        pre_nms_topk=128,
    )
    return Predictor(mcfg, variables, pcfg, use_pallas=False)


@pytest.fixture()
def detector(predictor):
    det = BatchingDetector(predictor, batch_size=4, max_wait_ms=40.0)
    yield det
    det.close()


def _batched_reference(predictor, images, batch_size=4):
    """What the daemon SHOULD produce: the same fixed-size padded batch
    through detect_preprocessed + per-image letterbox undo. (detect_image
    runs a batch-1 XLA program — a different compilation, so only
    tolerance-level agreement is guaranteed against it.)"""
    from jabd_tpu.ops import image as I
    from jabd_tpu.predict import undo_letterbox_pixels

    th, tw = predictor.pcfg.input_shape
    out = []
    for lo in range(0, len(images), batch_size):
        chunk = images[lo : lo + batch_size]
        batch = np.zeros((batch_size, th, tw, 3), np.float32)
        for i, img in enumerate(chunk):
            batch[i] = I.preprocess_input_np(
                I.letterbox_np(img, (tw, th)).astype(np.float32)
            )
        dets_b, valid_b = predictor.detect_preprocessed(batch)
        dets_b, valid_b = np.asarray(dets_b), np.asarray(valid_b)
        for i, img in enumerate(chunk):
            out.append(
                undo_letterbox_pixels(
                    dets_b[i][valid_b[i]], (th, tw), img.shape[:2], True
                )
            )
    return out


def test_concurrent_requests_match_detect_image(predictor, detector, rng):
    images = [
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        for h, w in [(48, 72), (96, 64), (64, 64), (80, 100), (50, 50)]
    ]
    want_exact = _batched_reference(predictor, images, batch_size=4)
    want_close = [predictor.detect_image(im) for im in images]

    results = [None] * len(images)

    def hit(i):
        results[i] = detector.detect(images[i])

    threads = [
        threading.Thread(target=hit, args=(i,)) for i in range(len(images))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, g in enumerate(results):
        assert g is not None, f"request {i} never completed"
        # daemon plumbing (batching, slicing, undo, fan-out) is exact...
        np.testing.assert_array_equal(
            want_exact[i], g, err_msg=f"request {i} vs batched reference"
        )
        # ...and agrees with the single-image path up to cross-compile
        # float differences (batch-1 vs batch-4 XLA programs).
        assert want_close[i].shape == g.shape
        np.testing.assert_allclose(
            want_close[i], g, rtol=1e-3, atol=5e-3,
            err_msg=f"request {i} vs detect_image",
        )

    st = detector.stats()
    assert st["requests"] == len(images)
    # concurrent submissions must have shared batches
    assert st["batches"] < len(images)


def test_mesh_backed_detector(rng):
    """The daemon over a mesh-sharded Predictor: same outputs."""
    from jabd_tpu.parallel import mesh as M

    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    pcfg = configs.PredictConfig(
        confidence=0.02, input_shape=(64, 64), max_detections=50,
        pre_nms_topk=128,
    )
    plain = Predictor(mcfg, variables, pcfg, use_pallas=False)
    sharded = Predictor(
        mcfg, variables, pcfg, use_pallas=False,
        mesh=M.make_mesh(jax.devices()[:2]),
    )
    det = BatchingDetector(sharded, batch_size=4, max_wait_ms=5.0)
    try:
        img = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
        want = plain.detect_image(img)
        got = det.detect(img)
        assert want.shape == got.shape
        # batch-1 vs sharded batch-4 are different XLA programs:
        # tolerance-level agreement
        np.testing.assert_allclose(want, got, rtol=1e-3, atol=5e-3)
    finally:
        det.close()

    with pytest.raises(ValueError, match="mesh"):
        BatchingDetector(sharded, batch_size=3)


def test_identify_endpoint(detector, rng):
    """POST /identify: detection rides the shared batches, then crops
    align+embed through the pipeline and name against the gallery. Uses
    the deterministic fake embedder (test_pipeline.py) so the expected
    embeddings/matches are computable exactly."""
    import cv2

    from jabd_tpu.pipeline import FacePipeline, Gallery
    from jabd_tpu.serve import IdentityService
    from tests.test_pipeline import _FakeEmbedder

    gallery = Gallery()
    gallery.enroll("ann", np.array([1, 0, 0, 0, 0, 0], np.float32))
    identity = IdentityService(
        FacePipeline(None, _FakeEmbedder(), {}, embed_batch=2),
        gallery=gallery,
        threshold=0.3,
    )
    srv = make_server(detector, port=0, identity=identity)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".png", img)  # lossless for exactness
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/identify",
            data=buf.tobytes(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.load(r)
        assert payload["count"] == len(payload["faces"])
        dets = detector.detect(img)  # same shared-batch path
        assert payload["count"] == len(dets)
        for f, d in zip(payload["faces"], dets):
            assert set(f) == {
                "box", "score", "landmarks", "name", "cosine", "embedding",
            }
            np.testing.assert_allclose(f["box"], d[:4], atol=2e-3)
            assert len(f["landmarks"]) == 10
            emb = np.asarray(f["embedding"], np.float32)
            np.testing.assert_allclose(
                np.linalg.norm(emb), 1.0, atol=1e-4
            )
            # naming matches the gallery's own verdict on this embedding
            want_name, want_sim = gallery.match(emb, threshold=0.3)[0]
            assert f["name"] == want_name
            assert f["cosine"] == pytest.approx(want_sim, abs=1e-3)
    finally:
        srv.shutdown()


def test_identify_disabled_returns_503(detector, rng):
    import cv2

    srv = make_server(detector, port=0)  # no identity service
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/identify",
            data=buf.tobytes(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
    finally:
        srv.shutdown()


def test_http_endpoint(detector, rng):
    import cv2

    srv = make_server(detector, port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect",
            data=buf.tobytes(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            payload = json.load(r)
        assert payload["count"] == len(payload["faces"])
        for f in payload["faces"]:
            assert len(f) == 15

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as r:
            st = json.load(r)
        assert st["requests"] >= 1 and st["batches"] >= 1

        # undecodable body -> 400, not a hung request
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect",
            data=b"not an image",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
