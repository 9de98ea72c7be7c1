"""BatchNorm folding for the IR recognition backbones (eval graphs).

The recognition twin of models/fold.py, for the IR block layout
(net.py:142-194 reference): each conv is DIRECTLY followed by its BN
(conv1->bn1, conv2->bn2, conv3->bn3, shortcut_conv->shortcut_bn,
input_conv->input_bn), and the embedding projection `fc` is followed by
`features_bn` — an affine-free BatchNorm1d(affine=False)
(net.py:278-283) that folds into the Dense as a column scale + bias.

Pre-activation BNs (bn0, output_bn) are NOT foldable: they precede
convs, and folding a preceding affine into a zero-padded conv would
change the padding semantics.

`net.py::_maybe_bn` / the fc path detect the folded tree at apply time
(missing bn stats => skip), mirroring ConvBN's fold detection.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from jabd_tpu.models.fold import _EPS, _fold_into

# conv param key -> the BN that consumes its output.
_PAIRS = (
    ("conv1", "bn1"),
    ("conv2", "bn2"),
    ("conv3", "bn3"),
    ("shortcut_conv", "shortcut_bn"),
    ("input_conv", "input_bn"),
    ("fc", "features_bn"),
)


def _walk(params: Dict[str, Any], stats: Dict[str, Any]):
    out = dict(params)
    out_stats = dict(stats)
    for conv_k, bn_k in _PAIRS:
        if conv_k not in out or bn_k not in out_stats:
            continue
        bn_p = out.pop(bn_k, None) or {
            # features_bn is affine-free: scale=1, bias=0.
            "scale": jnp.ones_like(out_stats[bn_k]["mean"]),
            "bias": jnp.zeros_like(out_stats[bn_k]["mean"]),
        }
        out[conv_k] = _fold_into(out[conv_k], bn_p, out_stats[bn_k])
        del out_stats[bn_k]
    for k, v in list(out.items()):
        if isinstance(v, dict) and k in stats and k not in dict(_PAIRS):
            sub_p, sub_s = _walk(v, stats.get(k, {}))
            out[k] = sub_p
            if sub_s:
                out_stats[k] = sub_s
            else:
                out_stats.pop(k, None)
    return out, out_stats


def fold_ir(variables, cast: Optional[Any] = None):
    """Returns folded variables for eval-mode IRBackbone apply.

    cast: optional dtype (e.g. jnp.bfloat16) for the folded params —
    identical values to the runtime compute cast, half the HBM weight
    bytes.
    """
    from jabd_tpu.models.fold import _to_dict

    variables = {k: _to_dict(v) for k, v in dict(variables).items()}
    params, stats = _walk(
        dict(variables["params"]), dict(variables.get("batch_stats", {}))
    )
    if cast is not None:
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, cast), params
        )
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    for k, v in variables.items():
        if k not in ("params", "batch_stats"):
            out[k] = v
    return out
