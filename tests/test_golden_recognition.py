"""Golden regression fixture for the RECOGNITION half (the detection
twin is tests/test_golden_e2e.py).

Re-runs landmark alignment (Umeyama similarity to the ArcFace
template, recognition/align.py) + the embed preprocessing
(pipeline.py::embed_crops semantics) + the IR-18 forward from
path-keyed deterministic weights on 2 committed lossless PNG scenes,
and pins crops, embeddings, and the inter-face cosine against
committed goldens — an in-suite, <30 s, CPU-only drift alarm for the
recognition forward path.

Regenerate (only after an INTENDED behavior change) with
`python scripts/make_recognition_golden.py` and commit the diff with
the reason.
"""

import importlib.util
import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "golden_recognition",
)


@pytest.fixture(scope="module")
def gen():
    """The generator module (single source of truth for the
    deterministic weights + preprocessing the goldens were made with)."""
    spec = importlib.util.spec_from_file_location(
        "make_recognition_golden",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "make_recognition_golden.py",
        ),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_recognition_golden_pipeline(gen):
    import cv2

    from jabd_tpu.recognition.align import align_face

    golden = dict(np.load(os.path.join(FIXTURE_DIR, "golden.npz")))
    model, variables = gen.deterministic_variables()
    crops = []
    for stem in ("scene_0", "scene_1"):
        scene = cv2.imread(os.path.join(FIXTURE_DIR, stem + ".png"))
        assert scene is not None
        lmk = golden[f"landmarks_{stem}"]
        crop = align_face(scene, lmk)
        # alignment is numpy+cv2: byte-exact across rounds
        np.testing.assert_array_equal(crop, golden[f"crop_{stem}"])
        crops.append(crop)

    emb = gen.embed(model, variables, np.stack(crops))
    ref = golden["embeddings"]
    # f32 forward on XLA:CPU: reduction-order drift across XLA versions
    # stays orders of magnitude below real defects (a wrong BN fold or
    # dropped layer shifts embeddings O(1))
    np.testing.assert_allclose(emb, ref, rtol=1e-4, atol=1e-4)
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    np.testing.assert_allclose(
        float(n[0] @ n[1]), float(golden["cosine_01"]), atol=1e-4
    )


def test_weight_filler_is_init_order_independent(gen):
    """The filler keys on the param PATH alone — two builds must agree
    leaf-for-leaf (guards the golden against spurious invalidation by
    init-order refactors, the failure mode seeded init would have)."""
    import jax

    _, v1 = gen.deterministic_variables()
    _, v2 = gen.deterministic_variables()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b), v1, v2
    )
