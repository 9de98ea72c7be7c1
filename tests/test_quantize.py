"""Int8 post-training quantization (models/quantize.py).

The reference has no quantized serving path; these tests anchor the
TPU-native one: exact integer conv math, calibration plumbing, and
end-to-end closeness of the quantized eval graph to the folded bf16
graph it derives from (the parity-tested baseline).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.models import quantize as Q
from jabd_tpu.models.fold import fold_batchnorm
from jabd_tpu.models.layers import ConvBN


def test_qconv_matches_manual_int_math():
    """qconv_apply == explicit quantize -> float conv -> dequantize."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1.2, (2, 8, 8, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.4, (3, 3, 5, 7)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (7,)), jnp.float32)
    absmax = float(jnp.max(jnp.abs(x)))
    q = Q._quantize_site({"kernel": k, "bias": b}, absmax)

    got = np.asarray(
        Q.qconv_apply(
            q, x, stride=1, pad=1, groups=1, dtype=jnp.float32
        )
    )

    # Manual: same rounding, conv in float over the INT values (exact —
    # int8 products/sums are exactly representable well within f32).
    x_q = np.clip(
        np.round(np.asarray(x) / float(q["x_scale"])), -127, 127
    )
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x_q, jnp.float32),
        jnp.asarray(np.asarray(q["kernel_q"], np.float32)),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    want = np.asarray(want) * np.asarray(
        q["w_scale"] * q["x_scale"]
    ) + np.asarray(b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_qconv_close_to_float_conv():
    """8-bit error bound on a single conv: small relative to the
    activation scale."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1.0, (2, 12, 12, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 16, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)
    q = Q._quantize_site(
        {"kernel": k, "bias": b}, float(jnp.max(jnp.abs(x)))
    )
    got = np.asarray(
        Q.qconv_apply(q, x, stride=1, pad=1, groups=1, dtype=jnp.float32)
    )
    want = np.asarray(
        jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        + b
    )
    err = np.abs(got - want)
    scale = np.abs(want).max()
    assert err.max() / scale < 0.02, err.max() / scale
    assert err.mean() / scale < 0.003, err.mean() / scale


@pytest.mark.parametrize("preset", ["mnet_v3_plain"])
def test_model_quantize_end_to_end(preset):
    """Calibrate + quantize a full detection eval graph; decoded head
    outputs stay close to the folded float graph's."""
    cfg = configs.get_model_config(preset)
    model = build_model(cfg, mode="eval")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1.0, (1, 128, 128, 3)), jnp.float32)

    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    folded = fold_batchnorm(v)
    assert "quant_calib" not in v and "quant_calib" not in folded

    calib = Q.calibrate(model, folded, [x])
    qvars, n = Q.quantize_variables(folded, calib)
    assert n >= 10, f"only {n} sites quantized"

    ref_cls, ref_box, ref_ldm = jax.jit(
        lambda vv: model.apply(vv, x, train=False)
    )(folded)
    got_cls, got_box, got_ldm = jax.jit(
        lambda vv: model.apply(vv, x, train=False)
    )(qvars)

    # Classification is post-softmax in eval mode: compare probabilities
    # directly; boxes/landmarks are regression offsets in anchor units.
    assert (
        np.abs(np.asarray(got_cls) - np.asarray(ref_cls)).mean() < 0.02
    )
    box_err = np.abs(np.asarray(got_box) - np.asarray(ref_box))
    assert box_err.mean() < 0.05, box_err.mean()

    # Depthwise convs must NOT be quantized (VPU-bound; documented).
    flat = jax.tree_util.tree_flatten_with_path(qvars["params"])[0]
    for path, leaf in flat:
        s = "/".join(str(p) for p in path)
        if "kernel_q" in s:
            assert leaf.shape[2] > 1, f"depthwise quantized at {s}"


def test_predictor_quantize_int8_serves():
    """Predictor.quantize_int8 calibrates on sample images and the
    quantized pipeline still detects (boxes close to the float path)."""
    cfg = configs.get_model_config("mnet_v3_plain")
    rng = np.random.default_rng(3)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    model = build_model(cfg, mode="eval")
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()

    from jabd_tpu.predict import Predictor

    pcfg = configs.PredictConfig(
        confidence=0.02, input_shape=(128, 128), max_detections=32,
        pre_nms_topk=128,
    )
    img = rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)
    p_f = Predictor(cfg, v, pcfg)
    ref = p_f.detect_image(img)

    p_q = Predictor(cfg, v, pcfg)
    n = p_q.quantize_int8(
        rng.integers(0, 255, (2, 160, 200, 3), dtype=np.uint8)
    )
    assert n >= 10
    got = p_q.detect_image(img)
    # Random weights -> near-uniform scores; the meaningful check is
    # that the quantized graph runs the whole serving pipeline and
    # produces comparably-sized outputs without NaNs.
    assert np.all(np.isfinite(got)) and got.shape[1] == 15
    assert abs(len(got) - len(ref)) <= max(3, int(0.5 * len(ref)))


@pytest.mark.slow
def test_cli_predict_quantize_flag(tmp_path):
    """`cli predict --quantize int8` self-calibrates and serves."""
    import cv2

    from jabd_tpu import cli

    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (96, 120, 3), dtype=np.uint8)
    src = str(tmp_path / "in.jpg")
    out = str(tmp_path / "out.jpg")
    cv2.imwrite(src, img)
    cli.main([
        "predict", "--model", "mnet_v3_plain", "--image", src,
        "--input-size", "64", "--confidence", "0.02", "--out", out,
        "--quantize", "int8",
    ])
    assert cv2.imread(out) is not None


def test_search_clip_ratio_end_to_end():
    """search_clip_ratio scores every grid ratio by end-to-end output
    error, picks the argmin, and quantize_variables(clip_ratio) shrinks
    the activation scales accordingly."""
    cfg = configs.get_model_config("mnet_v3_plain")
    model = build_model(cfg, mode="eval")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1.0, (2, 96, 96, 3)), jnp.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    folded = fold_batchnorm(v)
    calib = Q.calibrate(model, folded, [x])

    grid = (1.0, 0.9, 0.8)
    best, errs = Q.search_clip_ratio(model, folded, calib, [x], grid=grid)
    assert set(errs) == set(grid)
    assert all(np.isfinite(e) and e >= 0 for e in errs.values())
    assert errs[best] == min(errs.values())

    q1, _ = Q.quantize_variables(folded, calib, clip_ratio=1.0)
    q8, _ = Q.quantize_variables(folded, calib, clip_ratio=0.8)
    s1 = jax.tree_util.tree_flatten_with_path(q1["params"])[0]
    s8 = {
        "/".join(map(str, p)): l
        for p, l in jax.tree_util.tree_flatten_with_path(q8["params"])[0]
    }
    checked = 0
    for path, leaf in s1:
        key = "/".join(map(str, path))
        if key.endswith("x_scale']"):
            np.testing.assert_allclose(
                np.asarray(s8[key]), 0.8 * np.asarray(leaf), rtol=1e-6
            )
            checked += 1
    assert checked >= 10


def test_quantize_requires_folded_tree():
    cfg = configs.get_model_config("mnet_v3_plain")
    model = build_model(cfg, mode="eval")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    calib = Q.calibrate(model, v, [jnp.ones_like(x)])
    with pytest.raises(ValueError):
        Q.quantize_variables(v, calib)  # unfolded: no foldable sites


def test_search_clip_ratio_custom_score_fn():
    """score_fn replaces the output-error objective: candidates are
    scored by the TASK metric (the cli map-txt --gt-dir AP wiring).
    Pins: one call per grid point with a structurally-quantized tree,
    and the returned best ratio is the score_fn argmin, not the
    output-error argmin."""
    cfg = configs.get_model_config("mnet_v3_plain")
    model = build_model(cfg, mode="eval")
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1.0, (1, 64, 64, 3)), jnp.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    folded = fold_batchnorm(v)
    calib = Q.calibrate(model, folded, [x])

    grid = (1.0, 0.9, 0.8)
    seen = []
    fake = {1.0: 3.0, 0.9: 1.0, 0.8: 2.0}  # argmin at 0.9 by fiat

    def score_fn(qvars):
        leaves = jax.tree_util.tree_flatten_with_path(qvars["params"])[0]
        ratio = None
        for path, leaf in leaves:
            key = "/".join(map(str, path))
            if key.endswith("x_scale']"):
                base = float(np.asarray(calib_scale_for(key)))
                ratio = round(float(np.asarray(leaf)) / base, 6)
                break
        seen.append(ratio)
        return fake[ratio]

    # map an x_scale leaf back to its absmax/127 base (ratio recovery)
    base_q, _ = Q.quantize_variables(folded, calib, clip_ratio=1.0)
    base_leaves = {
        "/".join(map(str, p)): l
        for p, l in jax.tree_util.tree_flatten_with_path(
            base_q["params"]
        )[0]
    }

    def calib_scale_for(key):
        return base_leaves[key]

    best, scores = Q.search_clip_ratio(
        model, folded, calib, [], grid=grid, score_fn=score_fn
    )
    assert best == 0.9
    assert scores == fake
    assert sorted(seen) == sorted(grid)
