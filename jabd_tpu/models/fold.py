"""BatchNorm folding for eval graphs.

At inference every BatchNorm is a constant per-channel affine
``y = x * s + t`` with ``s = scale / sqrt(var + eps)`` and
``t = bias - mean * s``. Folding that affine into the preceding conv's
kernel/bias removes the BN params + running stats from the weight
stream entirely (the reference keeps eval-mode BN as separate torch ops,
predict.py:97-110; on TPU the folded form also lets the whole weight set
be pre-cast to bfloat16, halving HBM parameter traffic — numerically
identical to the runtime cast Flax would do anyway).

Folded patterns (the only BN sites in the detection models):
  * ConvBN:    params {conv, bn}            -> {conv(kernel*, bias*)}
  * SEModule:  params {fc1, bn, fc2}        -> {fc1(kernel*, bias*), fc2}
  * MNV3Block: params {skip_pw, skip_pw_bn} -> {skip_pw(kernel*, bias*)}

The modules detect folded param trees at apply time (no "bn" subtree =>
conv carries the bias; see models/layers.py::ConvBN). Any BN not matching
a pattern (EPSABlock's post-concat ``bn2``) is left in place — XLA
constant-folds its affine into the neighbouring op's epilogue, so it
costs no extra HBM pass.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-5  # all detection BNs use epsilon=1e-5 (models/layers.py)


def _fold_into(conv: Dict[str, Any], bn_p, bn_s) -> Dict[str, Any]:
    """Merge BN(scale,bias | mean,var) into conv {kernel[, bias]}."""
    s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _EPS)
    kernel = conv["kernel"] * s  # HWIO: s broadcasts over the out axis
    bias0 = conv.get("bias", 0.0)
    bias = (bias0 - bn_s["mean"]) * s + bn_p["bias"]
    return {"kernel": kernel, "bias": bias}


def _to_dict(tree):
    """Recursively convert Mapping subtrees (e.g. flax FrozenDict) to
    plain dicts so _walk's isinstance(dict) structure checks hold."""
    import collections.abc

    if isinstance(tree, collections.abc.Mapping):
        return {k: _to_dict(v) for k, v in tree.items()}
    return tree


def _is_leafdict(d) -> bool:
    return isinstance(d, dict) and any(
        not isinstance(v, dict) for v in d.values()
    )


def _walk(params: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    consumed = set()
    if "bn" in params and "conv" in params:  # ConvBN
        out["conv"] = _fold_into(params["conv"], params["bn"], stats["bn"])
        consumed |= {"bn", "conv"}
    elif "bn" in params and "fc1" in params:  # SEModule
        out["fc1"] = _fold_into(params["fc1"], params["bn"], stats["bn"])
        consumed |= {"bn", "fc1"}
    if "skip_pw_bn" in params and "skip_pw" in params:  # MNV3Block skip
        out["skip_pw"] = _fold_into(
            params["skip_pw"], params["skip_pw_bn"], stats["skip_pw_bn"]
        )
        consumed |= {"skip_pw_bn", "skip_pw"}
    for k, v in params.items():
        if k in consumed:
            continue
        if isinstance(v, dict) and not _is_leafdict(v):
            out[k] = _walk(v, stats.get(k, {}))
        elif isinstance(v, dict) and k in stats:
            # A BN with both params and stats that matched no pattern:
            # keep as-is (handled by the residual-stats pass below).
            out[k] = v
        else:
            out[k] = v
    return out


def _residual_stats(
    params: Dict[str, Any], stats: Dict[str, Any]
) -> Optional[Dict[str, Any]]:
    """batch_stats entries whose BN survived folding (e.g. EPSA bn2)."""
    out = {}
    for k, v in stats.items():
        if k not in params:
            continue  # folded away
        if _is_leafdict(v):
            out[k] = v
        else:
            sub = _residual_stats(params[k], v)
            if sub:
                out[k] = sub
    return out or None


def fold_batchnorm(variables, cast: Optional[Any] = None):
    """Return a folded-variables dict for eval-mode apply.

    cast: optional dtype (e.g. jnp.bfloat16) applied to every folded
    param leaf. For compute_dtype="bfloat16" models this is numerically
    identical to Flax's runtime param cast, but halves the HBM weight
    traffic per step.
    """
    # Normalize FrozenDict (or any Mapping) trees to plain dicts first:
    # _walk's isinstance(v, dict) checks would otherwise pass FrozenDict
    # subtrees through UNFOLDED silently.
    variables = {k: _to_dict(v) for k, v in dict(variables).items()}
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    folded = _walk(params, stats)
    if cast is not None:
        folded = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, cast), folded
        )
    out = {"params": folded}
    rest = _residual_stats(folded, stats)
    if rest:
        out["batch_stats"] = rest
    for k, v in variables.items():
        if k not in ("params", "batch_stats"):
            out[k] = v
    return out
