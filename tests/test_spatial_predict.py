"""Spatially-partitioned (multi-chip latency-mode) serving.

`Predictor(mesh=..., partition="spatial")` shards the image HEIGHT axis
across the mesh — GSPMD spatial partitioning, XLA inserting the conv
halo exchanges — so every chip cooperates on every image. This is the
latency mode for the 1280x1280 reference eval shape (predict.py:50):
unlike the DataParallel analog (partition="data", test_parallel_predict)
it has no batch-divisibility constraint, so batch=1 scales across chips.
No reference analog (nn.DataParallel only splits batch).

These tests pin the spatial path numerically identical to the
single-device path on the virtual 8-device CPU mesh, and assert the
forward is ACTUALLY partitioned (the compiled module must contain
cross-device collectives — a constraint that silently decayed to
replicated would pass parity while splitting nothing).
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


def _predictors(preset, mesh_devices=8):
    mcfg = dataclasses.replace(
        configs.get_model_config(preset), compute_dtype="float32"
    )
    variables = _tiny_variables(mcfg)
    pcfg = configs.PredictConfig(
        confidence=0.02,
        nms_iou=0.45,
        input_shape=(64, 64),
        max_detections=32,
        pre_nms_topk=64,
    )
    plain = Predictor(mcfg, variables, pcfg, use_pallas=False)
    mesh = M.make_mesh(jax.devices()[:mesh_devices])
    spatial = Predictor(
        mcfg,
        variables,
        pcfg,
        use_pallas=False,
        mesh=mesh,
        partition="spatial",
    )
    return plain, spatial


@pytest.fixture(scope="module")
def mnet_pair():
    return _predictors("retinaface_mnet025")


def test_spatial_matches_single_device(mnet_pair, rng):
    """Batch of 3 — NOT divisible by the 8-device mesh, which the data
    partition rejects: spatial mode has no batch constraint."""
    plain, spatial = mnet_pair
    x = rng.normal(0, 50, (3, 64, 64, 3)).astype(np.float32)
    d0, v0 = plain.detect_preprocessed(x)
    d1, v1 = spatial.detect_preprocessed(x)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-5, atol=1e-5
    )
    assert int(np.asarray(v1).sum()) > 0  # a non-vacuous comparison


def test_spatial_forward_is_actually_partitioned(mnet_pair, rng):
    """The compiled module must contain cross-device collectives (conv
    halo exchange / output all-gather). If the sharding constraint ever
    decays to replicated, parity would still pass — this wouldn't."""
    _, spatial = mnet_pair
    x = jnp.asarray(rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32))
    fn = spatial._spatial_detect_fn()
    txt = fn.lower(
        spatial.variables, x, spatial._anchors_for((64, 64))
    ).compile().as_text()
    assert any(
        w in txt
        for w in ("all-gather", "collective-permute", "all-reduce")
    )


def test_spatial_flagship_global_context_ops(rng):
    """The flagship's NLM attention + matmul-resize FPN contract over the
    full spatial extent — GSPMD must insert the gathers; parity proves
    it got the halos/gathers right for the joint-attention pathway."""
    plain, spatial = _predictors("jabd_flagship")
    x = rng.normal(0, 50, (2, 64, 64, 3)).astype(np.float32)
    d0, v0 = plain.detect_preprocessed(x)
    d1, v1 = spatial.detect_preprocessed(x)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-5, atol=1e-5
    )


def test_spatial_indivisible_height_raises(mnet_pair, rng):
    _, spatial = mnet_pair
    # 68 % 8 != 0 — anchors differ per-shape anyway, so build the raw
    # core path: detect_preprocessed validates height before dispatch.
    x = rng.normal(0, 50, (1, 68, 68, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="height"):
        spatial.detect_preprocessed(x)


def test_partition_arg_validated():
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    with pytest.raises(ValueError, match="partition"):
        Predictor(
            mcfg,
            _tiny_variables(mcfg),
            configs.PredictConfig(input_shape=(64, 64)),
            use_pallas=False,
            partition="pipeline",
        )
