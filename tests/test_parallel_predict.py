"""Mesh-sharded (multi-chip data-parallel) serving.

The reference serves through an `nn.DataParallel` wrap (predict.py:109)
that scatters the batch over GPUs. `Predictor(mesh=...)` is the TPU-native
equivalent: the fused detect graph runs under shard_map over a 1-D data
mesh, params replicated, batch axis sharded. These tests check the sharded
path is numerically identical to the single-device path on the virtual
8-device CPU mesh (conftest).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.parallel import mesh as M
from jabd_tpu.predict import Predictor

pytestmark = pytest.mark.slow  # compile-heavy module


def _tiny_variables(mcfg, size=64):
    model = build_model(mcfg, mode="eval")
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    return jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), x
    )


@pytest.fixture(scope="module")
def setup():
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    variables = _tiny_variables(mcfg)
    pcfg = configs.PredictConfig(
        confidence=0.02,
        nms_iou=0.45,
        input_shape=(64, 64),
        max_detections=64,
        pre_nms_topk=128,
    )
    plain = Predictor(mcfg, variables, pcfg, use_pallas=False)
    mesh = M.make_mesh(jax.devices()[:4])
    sharded = Predictor(
        mcfg, variables, pcfg, use_pallas=False, mesh=mesh
    )
    return plain, sharded, mesh


def test_sharded_matches_single_device(setup, rng):
    plain, sharded, mesh = setup
    x = rng.normal(0, 50, (8, 64, 64, 3)).astype(np.float32)
    d0, v0 = plain.detect_preprocessed(x)
    d1, v1 = sharded.detect_preprocessed(x)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-5, atol=1e-5
    )


def test_sharded_output_is_sharded(setup, rng):
    _, sharded, mesh = setup
    x = rng.normal(0, 50, (4, 64, 64, 3)).astype(np.float32)
    dets, valid = sharded.detect_preprocessed(x)
    # one batch row per device — the work actually split
    assert len(dets.sharding.device_set) == mesh.size
    shard_rows = {s.data.shape[0] for s in dets.addressable_shards}
    assert shard_rows == {1}


def test_indivisible_batch_raises(setup, rng):
    _, sharded, _ = setup
    x = rng.normal(0, 50, (3, 64, 64, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="mesh"):
        sharded.detect_preprocessed(x)


def test_detect_images_sharded_matches(setup, rng):
    """Mixed-resolution batched serving through the sharded graph: the
    on-device letterbox + detect must agree with the single-device
    Predictor on the same images."""
    plain, sharded, _ = setup
    images = [
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        for h, w in [(48, 72), (96, 64), (64, 64), (80, 100)]
    ]
    outs0 = plain.detect_images(images)
    outs1 = sharded.detect_images(images)
    assert len(outs0) == len(outs1) == 4
    for a, b in zip(outs0, outs1):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_single_device_mesh_is_plain_path():
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    variables = _tiny_variables(mcfg)
    mesh1 = M.make_mesh(jax.devices()[:1])
    p = Predictor(
        mcfg,
        variables,
        configs.PredictConfig(input_shape=(64, 64)),
        use_pallas=False,
        mesh=mesh1,
    )
    assert p.mesh is None  # degenerate mesh -> no shard_map wrapping
