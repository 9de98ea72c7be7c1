"""Coverage of the remaining reference inventory: soft-NMS, IoU head,
EPSA backbone, ablation presets, CLI count tool."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.ops import anchors as A
from jabd_tpu.ops import nms as N
from tests.conftest import random_boxes

pytestmark = pytest.mark.slow  # compile-heavy module



def test_soft_nms_decays_overlaps():
    boxes = np.asarray(
        [[0, 0, 1, 1], [0.05, 0.05, 1.05, 1.05], [3, 3, 4, 4]], np.float32
    )
    scores = np.asarray([0.9, 0.85, 0.8], np.float32)
    idx, rescored, valid = N.soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), sigma=0.5,
        score_threshold=0.01, max_out=3,
    )
    idx, rescored, valid = map(np.asarray, (idx, rescored, valid))
    assert valid.all()
    assert idx[0] == 0 and rescored[0] == pytest.approx(0.9)
    # Heavy overlap with box 0 -> decayed well below its original score.
    pos1 = list(idx).index(1)
    assert rescored[pos1] < 0.5
    # Disjoint box keeps ~its score.
    pos2 = list(idx).index(2)
    assert rescored[pos2] == pytest.approx(0.8, rel=1e-3)


def test_soft_nms_threshold_drops(rng):
    boxes = np.repeat(random_boxes(rng, 1), 5, axis=0)  # 5 identical boxes
    scores = np.linspace(0.9, 0.5, 5).astype(np.float32)
    idx, rescored, valid = N.soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), sigma=0.5,
        score_threshold=0.4, max_out=5,
    )
    # exp(-1/0.5) ~ 0.135 decay per selection: only the first survives.
    assert np.asarray(valid).sum() == 1


def test_iou_head_output():
    cfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"),
        compute_dtype="float32",
        with_iou_head=True,
    )
    model = build_model(cfg, mode="train")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), x
    )
    out = jax.jit(lambda v, i: model.apply(v, i, train=False))(variables, x)
    assert len(out) == 4
    n = A.num_anchors(cfg.anchors, (64, 64))
    assert out[3].shape == (1, n, 1)


def test_all_presets_have_consistent_channels():
    for name, cfg in configs.MODEL_PRESETS.items():
        assert len(cfg.in_channels) >= cfg.num_levels, name
        assert cfg.anchors.num_levels == cfg.num_levels, name
        assert cfg.out_channels % 4 == 0, name  # SSH split


@pytest.mark.slow
def test_epsa_preset_builds():
    cfg = dataclasses.replace(
        configs.get_model_config("epsa50_4level"), compute_dtype="float32"
    )
    model = build_model(cfg, mode="train")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), x
    )
    out = jax.jit(lambda v, i: model.apply(v, i, train=False))(variables, x)
    n = A.num_anchors(cfg.anchors, (64, 64))
    assert out[0].shape == (1, n, 4)


def test_tap_dropout_semantics():
    """re50_dropout mechanism (retinaface_eca_nonlocal_droupout.py:322-325):
    dropout on the backbone taps — stochastic per-rng in train mode,
    deterministic (identity) at eval. Exercised on the cheap mnet graph;
    the preset itself is covered by test_re50_dropout_preset_builds."""
    cfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"),
        compute_dtype="float32",
        tap_dropout=0.5,
    )
    model = build_model(cfg, mode="train")
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 50, (1, 64, 64, 3)),
        jnp.float32,
    )
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), x
    )

    base = dataclasses.replace(cfg, tap_dropout=0.0)
    base_model = build_model(base, mode="train")

    apply_train = jax.jit(
        lambda v, i, r: model.apply(
            v, i, train=True, rngs={"dropout": r},
            mutable=["batch_stats"],
        )[0]
    )
    a = apply_train(variables, x, jax.random.PRNGKey(1))
    b = apply_train(variables, x, jax.random.PRNGKey(2))
    a2 = apply_train(variables, x, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(a2[0]))

    # Eval: deterministic and identical to the dropout-free graph (the
    # deliberate deviation from torch F.dropout's training=True default).
    ev = jax.jit(lambda v, i: model.apply(v, i, train=False))(variables, x)
    ev_base = jax.jit(lambda v, i: base_model.apply(v, i, train=False))(
        variables, x
    )
    np.testing.assert_array_equal(np.asarray(ev[0]), np.asarray(ev_base[0]))


def test_tap_dropout_train_step():
    """The jitted train step derives the per-step dropout rng from
    (seed, state.step) — one step must run and produce finite loss."""
    from jabd_tpu import losses, train
    from jabd_tpu.ops import anchors as AA

    cfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"),
        compute_dtype="float32",
        tap_dropout=0.5,
    )
    tcfg = configs.TrainConfig(batch_size=2, image_size=64, max_targets=4)
    state = train.create_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, steps_per_epoch=5, image_size=64
    )
    step = train.make_train_step(cfg, tcfg)
    anchors = jnp.asarray(AA.generate_anchors(cfg.anchors, (64, 64)))
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(
        rng_np.normal(0, 50, (2, 64, 64, 3)).astype(np.float32)
    )
    targets = losses.Targets(
        boxes=jnp.asarray([[[0.2, 0.2, 0.6, 0.6]] * 4] * 2, jnp.float32),
        labels=jnp.ones((2, 4), jnp.float32),
        landms=jnp.full((2, 4, 10), 0.3, jnp.float32),
        valid=jnp.asarray([[True, False, False, False]] * 2),
    )
    new_state, metrics = step(state, images, targets, anchors)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_re50_dropout_preset_builds():
    cfg = dataclasses.replace(
        configs.get_model_config("re50_dropout"), compute_dtype="float32"
    )
    model = build_model(cfg, mode="eval")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), x
    )
    out = jax.jit(lambda v, i: model.apply(v, i, train=False))(variables, x)
    n = A.num_anchors(cfg.anchors, (64, 64))
    assert out[0].shape == (1, n, 4)


def test_cli_count_smoke(capsys):
    from jabd_tpu import cli

    cli.main(["count", "--model", "mnet_v3_plain", "--size", "64"])
    out = capsys.readouterr().out
    import json

    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["params_m"] > 0 and rec["gflops"] > 0


@pytest.mark.slow
def test_cli_video_mode(tmp_path, rng):
    """Video mode end-to-end: synthetic 3-frame clip -> annotated output."""
    import cv2

    from jabd_tpu import cli

    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 5, (128, 96))
    assert w.isOpened(), "cv2 cannot write mp4 in this environment"
    for _ in range(3):
        w.write(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    w.release()

    out = str(tmp_path / "out.mp4")
    cli.main([
        "video", "--model", "mnet_v3_plain", "--video", src,
        "--out", out, "--input-size", "64", "--confidence", "0.05",
    ])
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3
