"""Batched heterogeneous-size device letterbox vs the byte-exact host
path (ops/image.py::letterbox_np)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jabd_tpu.ops import image as I
from jabd_tpu.ops.resize import cv2_bilinear_taps


def _smooth(rng, h, w):
    import cv2

    x = rng.integers(0, 255, (h, w, 3), np.uint8)
    return cv2.GaussianBlur(x, (0, 0), 1.2)


def test_cv2_bilinear_taps_match_cv2_resize():
    import cv2

    rng = np.random.default_rng(0)
    img = _smooth(rng, 80, 100)
    for ow, oh in [(50, 40), (211, 159), (100, 80), (7, 5)]:
        ref = cv2.resize(img, (ow, oh)).astype(np.float64)
        xv, wv = cv2_bilinear_taps(img.shape[0], oh)
        xh, wh = cv2_bilinear_taps(img.shape[1], ow)
        mv = np.zeros((oh, img.shape[0]))
        mh = np.zeros((ow, img.shape[1]))
        for r in range(oh):
            for k in range(2):
                mv[r, min(xv[r] + k, img.shape[0] - 1)] += wv[r, k]
        for r in range(ow):
            for k in range(2):
                mh[r, min(xh[r] + k, img.shape[1] - 1)] += wh[r, k]
        ours = np.einsum("rh,hwc->rwc", mv, img.astype(np.float64))
        ours = np.einsum("ow,rwc->roc", mh, ours)
        err = np.abs(np.round(ours) - ref).max()
        # cv2 uint8 path uses 11-bit fixed-point taps
        assert err <= 2.0, f"{ow}x{oh}: {err}"


@pytest.mark.parametrize("shape", [(96, 128), (128, 96), (64, 64), (200, 40)])
def test_plan_letterbox_close_to_host(shape):
    rng = np.random.default_rng(1)
    img = _smooth(rng, *shape)
    target = (96, 96)  # (h, w)
    host = I.preprocess_input_np(
        I.letterbox_np(img, (target[1], target[0]))
    )
    padded, parts = I.plan_letterbox(img, target, (256, 256))
    out = np.asarray(
        I.letterbox_batch_device(
            jnp.asarray(padded[None]),
            jnp.asarray(parts[0][None]),
            jnp.asarray(parts[1][None]),
            jnp.asarray(parts[2][None]),
            jnp.asarray(parts[3][None]),
            resample_dtype=jnp.float32,
        )[0]
    )
    err = np.abs(out - host)
    assert err.mean() <= 0.5, err.mean()
    assert (err.max(-1) > 4).mean() <= 0.005


def test_oversize_source_pre_shrinks():
    rng = np.random.default_rng(2)
    img = _smooth(rng, 300, 500)
    padded, parts = I.plan_letterbox(img, (128, 128), (256, 256))
    assert padded.shape == (256, 256, 3)
    out = I.letterbox_batch_device(
        jnp.asarray(padded[None]),
        *(jnp.asarray(p[None]) for p in parts),
    )
    assert out.shape == (1, 128, 128, 3)


def test_cv2_cubic_taps_match_cv2_resize():
    """cv2.resize INTER_CUBIC float32 semantics (half-pixel centers,
    A=-0.75, border-replicate tap clamp, no center clip)."""
    import cv2

    from jabd_tpu.ops.resize import cv2_cubic_taps

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (37, 53, 3)).astype(np.float32)
    for ow, oh in [(29, 61), (96, 48), (53, 37), (13, 7)]:
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_CUBIC)
        mats = []
        for in_size, out_size in ((37, oh), (53, ow)):
            xm, w = cv2_cubic_taps(in_size, out_size)
            m = np.zeros((out_size, in_size), np.float64)
            for r in range(out_size):
                m[r, xm[r] : xm[r] + 4] += w[r]
            mats.append(m)
        out = np.einsum("Rh,hwc->Rwc", mats[0], img.astype(np.float64))
        out = np.einsum("Ww,rwc->rWc", mats[1], out)
        assert np.abs(out - ref).max() < 2e-3, (ow, oh)


@pytest.mark.parametrize(
    "shape,scale",
    [
        ((123, 211), 0.75),
        ((123, 211), 1.25),
        ((300, 180), 1.0),
        ((77, 401), 0.5),
    ],
)
def test_plan_pyramid_matches_host_two_stage(shape, scale):
    """Composed scale+letterbox plans (ONE device resample from the raw
    uint8 source) vs the host recipe they fuse: float32 cv2 INTER_CUBIC
    pre-scale (predict.py:413-417 semantics) then letterbox_np +
    preprocess. Both maps are linear, so agreement is f32-association
    tight, not just visually close."""
    import cv2

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    th, tw = 160, 160
    ih, iw = shape
    sw, sh = max(int(iw * scale), 32), max(int(ih * scale), 32)
    scaled = cv2.resize(
        img.astype(np.float32), (sw, sh), interpolation=cv2.INTER_CUBIC
    )
    host = I.preprocess_input_np(I.letterbox_np(scaled, (tw, th)))

    plan, (psh, psw) = I.plan_pyramid((ih, iw), scale, (th, tw))
    assert (psh, psw) == (sh, sw)
    padded = I.pad_to_bucket(img, (384, 448))
    dev = np.asarray(
        I.pyramid_batch_device(
            jnp.asarray(padded[None]),
            *(jnp.asarray(p[None]) for p in plan),
        )[0]
    )
    assert np.abs(dev - host).max() < 0.05


def test_plan_pyramid_zero_plan_is_fill():
    """All-zero plans (batch padding rows in the sweep) must yield the
    constant gray-fill frame, not garbage from the source bucket."""
    rng = np.random.default_rng(6)
    src = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    th = tw = 64
    k = I.PYRAMID_TAPS_K
    z32 = jnp.zeros((1, th), jnp.int32)
    zf = jnp.zeros((1, th), jnp.float32)
    zw = jnp.zeros((1, th, k), jnp.float32)
    out = np.asarray(
        I.pyramid_batch_device(jnp.asarray(src), z32, zw, zf, z32, zw, zf)
    )
    expect = I.LETTERBOX_FILL - np.asarray(I.MEANS, np.float32)
    np.testing.assert_allclose(out, np.broadcast_to(expect, out.shape))


@pytest.mark.slow
def test_predictor_detect_images_mixed_sizes():
    """One compiled graph serves mixed-resolution inputs; identity-resize
    case (source == target) must EXACTLY match detect_image."""
    import dataclasses
    import jax

    from jabd_tpu import configs
    from jabd_tpu.models import build_model
    from jabd_tpu.predict import Predictor

    mcfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    pcfg = configs.PredictConfig(
        confidence=0.02, input_shape=(128, 128), pre_nms_topk=256,
        max_detections=64,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False, fold_bn=True)

    rng = np.random.default_rng(3)
    imgs = [
        _smooth(rng, 128, 128),  # identity resize: byte-exact letterbox
        _smooth(rng, 97, 211),
        _smooth(rng, 256, 192),
    ]
    outs = pred.detect_images(imgs)
    assert len(outs) == 3
    for o in outs:
        assert o.ndim == 2 and o.shape[1] == 15

    # identity case: device letterbox == host letterbox byte-exactly
    # (resample matrix is a permutation), so the detection set must
    # match — up to f32 reassociation from running at batch 3 vs 1
    # (~1e-4 in pixel coords).
    single = pred.detect_image(imgs[0])
    assert outs[0].shape == single.shape
    np.testing.assert_allclose(outs[0], single, rtol=0, atol=2e-3)
