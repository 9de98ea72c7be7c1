"""Dependency-free flat-npz checkpoints.

Orbax (utils/checkpoint.py) is the production training checkpoint
format; this module is the PORTABLE one — a single .npz of
{tree-path: array} for committed test fixtures, cross-process handoff
(train on TPU, verify on CPU), and artifact exchange without an Orbax
version in common. The reference's analog is torch.save of a flat
state_dict (train_mobilenetV3_ecagai.py:547).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def flatten_tree(tree: Any, prefix: str = "") -> dict:
    """{prefix + keystr(path): np.array} for every leaf."""
    return {
        prefix + jax.tree_util.keystr(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def unflatten_into(template: Any, flat: dict, prefix: str = "") -> Any:
    """Rebuild `template`'s structure from `flat` (shape-checked)."""
    leaves_with_path = jax.tree_util.tree_leaves_with_path(template)
    treedef = jax.tree_util.tree_structure(template)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = prefix + jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f"checkpoint is missing {key}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"{key}: checkpoint shape {arr.shape} != {leaf.shape}"
            )
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_variables_npz(
    path: str, variables: Any, params_dtype: Optional[Any] = None
) -> None:
    """Save {"params": ..., "batch_stats": ...} as one flat npz.
    `params_dtype` (e.g. np.float16) downcasts params only — batch
    stats stay f32 (running variances lose too much in f16)."""
    params = variables["params"]
    if params_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, params_dtype), params
        )
    flat = flatten_tree(params, "params")
    flat.update(flatten_tree(variables.get("batch_stats", {}), "batch_stats"))
    np.savez_compressed(path, **flat)


def load_variables_npz(path: str, template: Any) -> dict:
    """Load a save_variables_npz file back into `template`'s structure
    ({"params", "batch_stats"} as produced by model.init), casting
    params to f32."""
    import jax.numpy as jnp

    flat = dict(np.load(path, allow_pickle=False))
    params = unflatten_into(template["params"], flat, "params")
    out = {
        "params": jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), params
        )
    }
    if "batch_stats" in template:
        out["batch_stats"] = unflatten_into(
            template["batch_stats"], flat, "batch_stats"
        )
    return out
