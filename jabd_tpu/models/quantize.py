"""Post-training int8 quantization for eval graphs (serving).

TPU v5e executes int8 x int8 -> int32 on the MXU at 2x the bf16 rate,
and int8 weights/activations halve the HBM bytes per conv again. The
reference has no quantized serving path (predict.py runs fp32 torch);
this module adds one the TPU-native way:

  * Builds ON TOP of BN folding (models/fold.py): a folded ConvBN is a
    conv + per-channel bias; quantization replaces its ``conv`` params
    subtree with a ``qconv`` subtree holding an int8 kernel, per-output-
    channel weight scales, a per-tensor input activation scale, and the
    float bias. ConvBN detects the subtree at apply time (same pattern
    as fold detection — no flag threading).
  * Weights: symmetric per-output-channel int8 (absmax / 127).
  * Activations: symmetric per-tensor int8, scale calibrated by running
    sample batches and recording each ConvBN input's absolute maximum
    (ConvBN sows ``quant_calib``/x_absmax — a no-op unless the
    collection is marked mutable, so production applies pay nothing).
  * Depthwise convs stay in bf16: they are VPU-bound (BENCH_NOTES
    "Next perf levers" #1), so int8 buys no MXU there, and per-channel
    activation error compounds across the depthwise chain.

Usage:
    folded = fold_batchnorm(variables, cast=jnp.bfloat16)
    calib  = calibrate(model, folded, sample_batches)
    qvars  = quantize_variables(folded, calib)
    out    = model.apply(qvars, images, train=False)

Calibration refinement: absmax clips nothing but wastes int8 range on
outliers. ``search_clip_ratio`` grid-searches ONE global multiplier on
the activation scales, scoring each candidate by the END-TO-END output
error of the quantized graph vs the float graph on held-out batches —
the metric that actually matters, unlike per-site percentile proxies
(which need histogram sows and still optimize the wrong objective).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

_QCONV = "qconv"


def qconv_apply(
    q: Dict[str, Any],
    x: jnp.ndarray,
    *,
    stride: int,
    pad: int,
    groups: int,
    dtype,
) -> jnp.ndarray:
    """Quantized ConvBN body: int8 conv -> int32 -> dequant + bias.

    Padding zeros are exact in the quantized domain (symmetric scheme:
    zero-point 0), so the padded int8 conv matches the float conv's
    zero padding semantics.
    """
    x_scale = q["x_scale"].astype(jnp.float32)
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / x_scale), -127.0, 127.0
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q,
        q["kernel_q"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    scale = (q["w_scale"] * x_scale).astype(jnp.float32)  # [C_out]
    y = y.astype(jnp.float32) * scale + q["bias"].astype(jnp.float32)
    return y.astype(dtype)


def qdense_apply(q: Dict[str, Any], x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Quantized Dense: int8 x int8 -> int32 matmul -> dequant + bias."""
    x_scale = q["x_scale"].astype(jnp.float32)
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / x_scale), -127.0, 127.0
    ).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q,
        q["kernel_q"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scale = (q["w_scale"] * x_scale).astype(jnp.float32)
    y = y.astype(jnp.float32) * scale + q["bias"].astype(jnp.float32)
    return y.astype(dtype)


def calibrate(model, variables, batches: Iterable) -> Dict[str, Any]:
    """Run sample batches through the eval graph, collecting each
    ConvBN input's absmax (the ``quant_calib`` sow sites). Returns the
    merged calibration tree (module-path dict of {"x_absmax": float})."""

    @jax.jit
    def _run(v, x):
        return model.apply(v, x, train=False, mutable=["quant_calib"])

    merged: Optional[Dict[str, Any]] = None
    for x in batches:
        _, aux = _run(variables, jnp.asarray(x))
        got = jax.tree_util.tree_map(
            lambda t: np.asarray(t), aux["quant_calib"]
        )
        if merged is None:
            merged = got
        else:
            merged = jax.tree_util.tree_map(np.maximum, merged, got)
    if merged is None:
        raise ValueError("calibrate: no batches provided")
    return merged


def _is_foldable_conv(sub) -> bool:
    return (
        isinstance(sub, dict)
        and isinstance(sub.get("conv"), dict)
        and "kernel" in sub["conv"]
        and "bias" in sub["conv"]  # folded (fold_batchnorm ran)
        and "bn" not in sub
    )


def _quantize_site(conv: Dict[str, Any], absmax: float, clip_ratio: float = 1.0):
    # conv kernel [kh, kw, cin/g, cout] or dense kernel [cin, cout]:
    # per-output-channel scales either way (reduce all axes but the last).
    k = np.asarray(conv["kernel"], np.float32)
    w_absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)))
    w_scale = np.maximum(w_absmax, 1e-12) / 127.0
    kernel_q = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
    return {
        "kernel_q": jnp.asarray(kernel_q),
        "w_scale": jnp.asarray(w_scale, jnp.float32),
        "x_scale": jnp.asarray(
            max(float(absmax) * clip_ratio, 1e-12) / 127.0
        ),
        "bias": jnp.asarray(conv["bias"], jnp.float32),
    }


def _walk(
    params: Dict[str, Any],
    calib: Dict[str, Any],
    stats: list,
    clip_ratio: float = 1.0,
):
    out: Dict[str, Any] = {}
    for k, v in params.items():
        c = calib.get(k) if isinstance(calib, dict) else None
        # Flat layout (recognition IR blocks, net.py::_conv): the folded
        # conv dict {kernel, bias} sits next to its calibration scalar
        # "<name>_absmax" sown by the enclosing block.
        flat_absmax = (
            calib.get(f"{k}_absmax") if isinstance(calib, dict) else None
        )
        if (
            isinstance(v, dict)
            and "kernel" in v
            and "bias" in v
            and "kernel_q" not in v
            and np.ndim(np.asarray(v["kernel"])) in (2, 4)
            and flat_absmax is not None
        ):
            absmax = float(np.max(np.asarray(flat_absmax)))
            kern = np.asarray(v["kernel"])
            depthwise = (
                kern.ndim == 4
                and kern.shape[2] == 1
                and kern.shape[3] > 1
            )
            if depthwise or absmax == 0.0:
                out[k] = v
                stats.append((k, "skipped"))
            else:
                out[k] = _quantize_site(v, absmax, clip_ratio)
                stats.append((k, "quantized"))
            continue
        if (
            _is_foldable_conv(v)
            and isinstance(c, dict)
            and "x_absmax" in c
        ):
            kern = np.asarray(v["conv"]["kernel"])
            absmax = float(np.max(np.asarray(c["x_absmax"])))
            depthwise = kern.shape[2] == 1 and kern.shape[3] > 1
            if depthwise or absmax == 0.0:
                out[k] = v
                stats.append((k, "skipped"))
            else:
                q = dict(v)
                q[_QCONV] = _quantize_site(v["conv"], absmax, clip_ratio)
                del q["conv"]
                out[k] = q
                stats.append((k, "quantized"))
        elif isinstance(v, dict):
            out[k] = _walk(
                v, c if isinstance(c, dict) else {}, stats, clip_ratio
            )
        else:
            out[k] = v
    return out


def quantize_variables(
    variables, calib: Dict[str, Any], clip_ratio: float = 1.0
):
    """Replace every calibrated, folded, non-depthwise ConvBN ``conv``
    subtree with a ``qconv`` int8 subtree. ``clip_ratio`` scales every
    activation scale below its calibrated absmax (see
    ``search_clip_ratio``). Returns (new_variables, n_quantized)."""
    variables = dict(variables)
    stats: list = []
    params = _walk(dict(variables["params"]), calib, stats, clip_ratio)
    variables["params"] = params
    n = sum(1 for _, s in stats if s == "quantized")
    if n == 0:
        raise ValueError(
            "quantize_variables: no quantizable ConvBN sites found — "
            "did you run fold_batchnorm first and calibrate on the "
            "same tree?"
        )
    return variables, n


def _rel_err(out, ref) -> float:
    """Mean per-leaf relative L2 error between two output pytrees."""
    errs = []
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        den = float(np.sqrt(np.sum(b * b)))
        errs.append(float(np.sqrt(np.sum((a - b) ** 2))) / max(den, 1e-30))
    return float(np.mean(errs))


def search_clip_ratio(
    model,
    variables,
    calib: Dict[str, Any],
    batches: Iterable,
    grid=(1.0, 0.95, 0.9, 0.85, 0.8, 0.7, 0.6),
    score_fn=None,
):
    """Grid-search a global activation clip ratio by END-TO-END error.

    For each candidate ratio r, quantizes with ``x_scale = absmax*r/127``
    and scores the quantized graph's outputs against the float graph's
    on ``batches`` (mean per-leaf relative L2 over the whole output
    pytree). Returns ``(best_ratio, {ratio: score})``. One forward per
    (batch, ratio) — all candidates share one compiled graph because the
    quantized param STRUCTURE is ratio-independent.

    This is the accuracy-oriented refinement of absmax calibration
    (clipping outliers spends the int8 grid where the mass is); the
    end-to-end objective subsumes per-site percentile heuristics.

    ``score_fn(qvars) -> float`` (lower is better) replaces the
    output-error objective entirely — used to score candidates by the
    TASK metric, e.g. negative WIDER AP through the evaluator when a GT
    tree is available (cli map-txt --quantize-search --gt-dir).
    """

    @jax.jit
    def _run(v, x):
        return model.apply(v, x, train=False)

    if score_fn is None:
        batches = [jnp.asarray(x) for x in batches]
        if not batches:
            raise ValueError("search_clip_ratio: no batches provided")
        refs = [jax.device_get(_run(variables, x)) for x in batches]

        def score_fn(qvars):
            return float(
                np.mean(
                    [
                        _rel_err(jax.device_get(_run(qvars, x)), ref)
                        for x, ref in zip(batches, refs)
                    ]
                )
            )

    errs: Dict[float, float] = {}
    for r in grid:
        qvars, _ = quantize_variables(variables, calib, clip_ratio=float(r))
        errs[float(r)] = float(score_fn(qvars))
    best = min(errs, key=errs.get)
    return best, errs
