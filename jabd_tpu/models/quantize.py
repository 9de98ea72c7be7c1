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


def _quantize_site(conv: Dict[str, Any], absmax: float):
    # conv kernel [kh, kw, cin/g, cout] or dense kernel [cin, cout]:
    # per-output-channel scales either way (reduce all axes but the last).
    k = np.asarray(conv["kernel"], np.float32)
    w_absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)))
    w_scale = np.maximum(w_absmax, 1e-12) / 127.0
    kernel_q = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
    return {
        "kernel_q": jnp.asarray(kernel_q),
        "w_scale": jnp.asarray(w_scale, jnp.float32),
        "x_scale": jnp.asarray(max(float(absmax), 1e-12) / 127.0),
        "bias": jnp.asarray(conv["bias"], jnp.float32),
    }


def _walk(params: Dict[str, Any], calib: Dict[str, Any], stats: list):
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
                out[k] = _quantize_site(v, absmax)
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
                q[_QCONV] = _quantize_site(v["conv"], absmax)
                del q["conv"]
                out[k] = q
                stats.append((k, "quantized"))
        elif isinstance(v, dict):
            out[k] = _walk(v, c if isinstance(c, dict) else {}, stats)
        else:
            out[k] = v
    return out


def quantize_variables(variables, calib: Dict[str, Any]):
    """Replace every calibrated, folded, non-depthwise ConvBN ``conv``
    subtree with a ``qconv`` int8 subtree. Returns (new_variables,
    n_quantized)."""
    variables = dict(variables)
    stats: list = []
    params = _walk(dict(variables["params"]), calib, stats)
    variables["params"] = params
    n = sum(1 for _, s in stats if s == "quantized")
    if n == 0:
        raise ValueError(
            "quantize_variables: no quantizable ConvBN sites found — "
            "did you run fold_batchnorm first and calibrate on the "
            "same tree?"
        )
    return variables, n
