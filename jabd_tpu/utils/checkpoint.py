"""Checkpoint / resume via Orbax.

Replaces the reference's `torch.save(model.state_dict(), ...)` every
save_period epochs (train_mobilenetV3_ecagai.py:545-549) — which loses
optimizer state — with step-indexed Orbax checkpoints of params +
batch_stats + optimizer state (SURVEY.md section 5 checkpoint plan).

Also provides the shape-filtered partial restore that the reference uses
to resume across architecture drift (train_mobilenetV3_ecagai.py:450-460:
keep only state-dict entries whose shapes match the fresh model).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into the template TrainState (same treedef)."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        payload = {
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(payload)
        )
        return state_template.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )


def partial_load(target_params: Any, source_params: Any) -> Any:
    """Shape-filtered partial load: copy every leaf from source whose path
    exists in target with the SAME shape; keep the target leaf otherwise.
    (train_mobilenetV3_ecagai.py:450-460 semantics.)"""
    flat_t = jax.tree_util.tree_flatten_with_path(target_params)[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source_params)[0])
    out = {}
    n_loaded = 0
    for path, leaf in flat_t:
        src = flat_s.get(path)
        if src is not None and np.shape(src) == np.shape(leaf):
            out[path] = src
            n_loaded += 1
        else:
            out[path] = leaf
    treedef = jax.tree_util.tree_structure(target_params)
    leaves = [out[path] for path, _ in flat_t]
    return jax.tree_util.tree_unflatten(treedef, leaves), n_loaded
