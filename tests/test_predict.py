"""Predictor pipeline tests with a random-init tiny model: fixed-shape
fused graph, pixel-space outputs, letterbox-undo, map-txt row format."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.predict import Predictor

pytestmark = pytest.mark.slow  # compile-heavy module



@pytest.fixture(scope="module")
def predictor():
    mcfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), x
    )
    pcfg = configs.PredictConfig(
        confidence=0.02,  # random init -> scores near 0.5-ish after softmax
        nms_iou=0.45,
        input_shape=(64, 64),
        max_detections=100,
        pre_nms_topk=128,
    )
    return Predictor(mcfg, variables, pcfg, use_pallas=False)


def test_get_fps_chained(predictor, rng):
    """The chained fps harness (honest under async dispatch) must run the
    full fused graph and return a positive rate; the wall-clock
    reference-parity harness must too."""
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    fps_chained = predictor.get_fps(img, test_interval=3, method="chained")
    fps_wall = predictor.get_fps(img, test_interval=3, method="wall")
    assert fps_chained > 0 and np.isfinite(fps_chained)
    assert fps_wall > 0 and np.isfinite(fps_wall)


def test_detect_preprocessed_shapes(predictor, rng):
    x = rng.normal(0, 50, (2, 64, 64, 3)).astype(np.float32)
    dets, valid = predictor.detect_preprocessed(x)
    assert dets.shape == (2, 100, 15)
    assert valid.shape == (2, 100)


def test_detect_image_pixel_space(predictor, rng):
    img = rng.integers(0, 255, (48, 96, 3), dtype=np.uint8)
    dets = predictor.detect_image(img)
    assert dets.ndim == 2 and dets.shape[1] == 15
    if len(dets):
        # Scores in (0, 1]; letterbox-undone coords roughly within image.
        assert (dets[:, 4] > 0).all() and (dets[:, 4] <= 1).all()


def test_map_txt_rows_sorted(predictor, rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    rows = predictor.get_map_txt_rows(img)
    assert rows.shape[1] == 5
    if len(rows) > 1:
        assert (np.diff(rows[:, 4]) <= 1e-9).all()


def test_multiscale_runs(predictor, rng):
    img = rng.integers(0, 255, (50, 40, 3), dtype=np.uint8)
    dets = predictor.detect_multiscale(img, scales=(1.0, 1.5))
    assert dets.ndim == 2 and dets.shape[1] == 15
