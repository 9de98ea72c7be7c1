"""AOT serving artifacts (jabd_tpu/aot.py, jax.export/StableHLO).

The artifact must reproduce the live Predictor exactly (same fused graph,
same folded params), load without any model-building code, and refuse
mismatched platforms/batches loudly.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jabd_tpu import configs
from jabd_tpu.aot import (
    AotDetector,
    export_detector,
    export_embedder,
    load_exported,
)
from jabd_tpu.models import build_model
from jabd_tpu.predict import Predictor

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


@pytest.fixture(scope="module")
def artifact(predictor, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aot"))
    export_detector(
        predictor,
        d,
        batch_size=2,
        platforms=("cpu",),
        model_name="retinaface_mnet025",
    )
    return d


def test_artifact_files(artifact):
    names = set(os.listdir(artifact))
    assert {"graph.jaxexport", "params.msgpack", "manifest.json"} <= names
    with open(os.path.join(artifact, "manifest.json")) as f:
        m = json.load(f)
    assert m["kind"] == "detector" and m["batch_size"] == 2
    assert m["pcfg"]["confidence"] == pytest.approx(0.02)


def test_loaded_matches_live_predictor(artifact, predictor, rng):
    aot = load_exported(artifact)
    assert isinstance(aot, AotDetector)
    x = rng.normal(0, 50, (2, 64, 64, 3)).astype(np.float32)
    d0, v0 = predictor.detect_preprocessed(x)
    d1, v1 = aot.detect_preprocessed(x)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-6
    )


def test_detect_image_matches(artifact, predictor, rng):
    aot = load_exported(artifact)
    img = rng.integers(0, 255, (48, 80, 3), dtype=np.uint8)
    a = predictor.detect_image(img)
    b = aot.detect_image(img)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_mesh_serving_matches(artifact, predictor, rng):
    """A loaded artifact sharded over a mesh: the exported batch is the
    per-chip batch, outputs must equal the plain artifact run per chunk."""
    from jabd_tpu.parallel import mesh as M

    mesh = M.make_mesh(jax.devices()[:2])
    plain = load_exported(artifact)
    sharded = load_exported(artifact, mesh=mesh)
    assert sharded.batch_size == 2 * plain.batch_size
    x = rng.normal(0, 50, (4, 64, 64, 3)).astype(np.float32)
    d, v = sharded.detect_preprocessed(x)
    for lo in (0, 2):
        d0, v0 = plain.detect_preprocessed(x[lo : lo + 2])
        np.testing.assert_array_equal(
            np.asarray(v0), np.asarray(v)[lo : lo + 2]
        )
        np.testing.assert_allclose(
            np.asarray(d0),
            np.asarray(d)[lo : lo + 2],
            rtol=1e-6,
            atol=1e-6,
        )


def test_batch_mismatch_raises(artifact, rng):
    aot = load_exported(artifact)
    with pytest.raises(ValueError, match="batch"):
        aot.detect_preprocessed(
            rng.normal(0, 1, (3, 64, 64, 3)).astype(np.float32)
        )


def test_future_version_refused(artifact, tmp_path):
    import shutil

    d = str(tmp_path / "newer")
    shutil.copytree(artifact, d)
    p = os.path.join(d, "manifest.json")
    with open(p) as f:
        m = json.load(f)
    m["version"] = 99
    with open(p, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="version"):
        load_exported(d)


def test_tpu_crossbuild_from_cpu_host(predictor, tmp_path):
    """A CPU-only host can emit the production TPU artifact (Pallas NMS
    included); loading it HERE must refuse (backend mismatch) instead of
    failing deep inside execution."""
    d = str(tmp_path / "tpu_artifact")
    export_detector(predictor, d, batch_size=1, platforms=("tpu",))
    with open(os.path.join(d, "manifest.json")) as f:
        assert json.load(f)["use_pallas"] is True
    with pytest.raises(ValueError, match="backend"):
        load_exported(d)


def test_pallas_multiplatform_refused(predictor, tmp_path):
    with pytest.raises(ValueError, match="[Pp]allas"):
        export_detector(
            predictor,
            str(tmp_path / "x"),
            platforms=("cpu", "tpu"),
            use_pallas=True,
        )


def test_int8_artifact_matches_live(tmp_path, rng):
    """An artifact exported AFTER quantize_int8 captures the int8 graph:
    loading it must reproduce the live quantized predictor."""
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    pcfg = configs.PredictConfig(
        confidence=0.02, input_shape=(64, 64), max_detections=50,
        pre_nms_topk=128,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False)
    n = pred.quantize_int8(
        [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(2)]
    )
    assert n > 0
    d = str(tmp_path / "int8")
    export_detector(pred, d, batch_size=2, platforms=("cpu",))
    aot = load_exported(d)
    x = rng.normal(0, 50, (2, 64, 64, 3)).astype(np.float32)
    d0, v0 = pred.detect_preprocessed(x)
    d1, v1 = aot.detect_preprocessed(x)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-6
    )


def test_recognition_cli_export(tmp_path):
    from jabd_tpu.recognition import cli as rcli

    out = str(tmp_path / "emb_artifact")
    rcli.main(
        [
            "export",
            "--arch",
            "ir_18",
            "--out",
            out,
            "--batch-size",
            "2",
            "--platforms",
            "cpu",
        ]
    )
    aot = load_exported(out)
    assert aot.batch_size == 2
    e, n = aot.embed(np.zeros((2, 112, 112, 3), np.float32))
    assert e.shape == (2, 512)


def test_embedder_roundtrip(tmp_path, rng):
    from jabd_tpu.recognition import build_model as build_ir

    model = build_ir("ir_18")
    x0 = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(1), x0
    )
    d = str(tmp_path / "emb")
    export_embedder(
        model, variables, d, batch_size=2, image_size=56,
        platforms=("cpu",), model_name="ir_18",
    )
    aot = load_exported(d)
    x = rng.normal(0, 1, (2, 56, 56, 3)).astype(np.float32)
    e0, n0 = model.apply(variables, jnp.asarray(x), train=False)
    e1, n1 = aot.embed(x)
    np.testing.assert_allclose(
        np.asarray(e0), np.asarray(e1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(n0), np.asarray(n1), rtol=1e-5, atol=1e-5
    )
