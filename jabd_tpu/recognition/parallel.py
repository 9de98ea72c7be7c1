"""Class-sharded (model-parallel) margin-head training, PartialFC-style.

The reference scales recognition training with Lightning DDP only:
every rank replicates the FULL classifier and NCCL all-reduces its
gradients (main.py:37-50, train_val.py:34-42, utils.py:49-92). At
web-scale identity counts the classifier IS the model — 2M classes
x 512 is 4 GB of fp32 kernel plus as much again in momentum — so
replicating it wastes the memory of every added chip, which is why
large-scale face recognition trains with a class-sharded head
(PartialFC). The reference has no such path.

The TPU-native version needs no hand-written collectives: keep the ONE
jitted train step (recognition/train.py::make_train_step — margins,
EMA norm statistics, CE, and SGD stay the tested single-device code)
and annotate shardings. The head kernel [D, C] is sharded along the
CLASS axis over the same 1-D 'data' mesh the batch rides (PartialFC
makes the same placement choice); everything else replicates. XLA's
SPMD partitioner then derives exactly the schedule PartialFC hand
codes: all-gather the batch-sharded embeddings for the local-classes
matmul, partition the [B, C] logits and one-hot margin application,
turn the softmax normalization into a psum over class shards, and
reduce-scatter the embedding cotangent on the way back — from one
sharding annotation (scaling-book recipe: pick a mesh, annotate, let
XLA insert collectives).

Composability: the optimizer state shards with its parameter (the SGD
momentum of the kernel follows the kernel's spec), so per-chip head
memory is kernel/N + momentum/N. Uneven class counts (70722 % 8 != 0
in the production config) are handled by EXACT class padding at head
construction — build_head(..., pad_to=mesh size) rounds the kernel
width up and masks the padding columns to -3e4 pre-softmax (zero
probability, zero gradient), since jax.device_put requires sharded
dims to divide evenly.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jabd_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicate
from jabd_tpu.recognition.train import (
    RecTrainState,
    make_train_step,
    make_train_step_aug,
)


def _path_keys(path) -> list:
    keys = []
    for k in path:
        if hasattr(k, "key"):
            keys.append(str(k.key))
        elif hasattr(k, "name"):
            keys.append(str(k.name))
    return keys


def rec_state_shardings(
    state: RecTrainState,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    fsdp: bool = False,
) -> Any:
    """Sharding tree for a RecTrainState: the head classifier kernel
    (and its optimizer-state mirrors — optax trees mirror the param
    structure, so the same path predicate finds the momentum leaf) is
    sharded [D, C/N] along the class axis; every other leaf replicates.

    `fsdp=True` additionally applies the FSDP/ZeRO rule
    (parallel/fsdp.py) to the remaining leaves: large BACKBONE params
    and their SGD momentum shard along their largest mesh-divisible
    axis over the same mesh — composing class-parallel (tp) with
    weight-update sharding on one axis. The reference replicates the
    whole IR backbone + optimizer per DDP rank (main.py:37-50)."""
    rep = replicate(mesh)
    col = NamedSharding(mesh, P(None, axis_name))

    n = int(mesh.shape[axis_name])
    if fsdp:
        from jabd_tpu.parallel.fsdp import leaf_spec

    def spec(path, leaf):
        keys = _path_keys(path)
        if (
            "head" in keys
            and keys
            and keys[-1] == "kernel"
            and getattr(leaf, "ndim", 0) == 2
        ):
            if leaf.shape[1] % n != 0:
                raise ValueError(
                    f"head kernel class dim {leaf.shape[1]} does not "
                    f"divide across {n} devices — build the head with "
                    f"pad_to={n} (build_head(..., pad_to=mesh size); "
                    "padding columns are exactly masked)"
                )
            return col
        if fsdp:
            return NamedSharding(
                mesh, leaf_spec(getattr(leaf, "shape", ()), n)
            )
        return rep

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_rec_state(
    state: RecTrainState,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    fsdp: bool = False,
) -> Tuple[RecTrainState, Any]:
    """Place a (host or single-device) RecTrainState onto the mesh with
    the class-sharded-head layout. Returns (sharded_state, shardings)."""
    shardings = rec_state_shardings(state, mesh, axis_name, fsdp=fsdp)
    placed = jax.tree_util.tree_map(jax.device_put, state, shardings)
    return placed, shardings


def make_sharded_train_step(
    model, head, state: RecTrainState, mesh: Mesh,
    axis_name: str = DATA_AXIS, fsdp: bool = False,
):
    """Jit the production recognition train step over the mesh:
    batch sharded on the data axis, head kernel sharded on the class
    axis, params/stats replicated (or FSDP-sharded with `fsdp=True` —
    see rec_state_shardings). Donates the state (same in/out layout,
    no resharding on the donation path).

    Returns (step, sharded_state).
    """
    shardings = rec_state_shardings(state, mesh, axis_name, fsdp=fsdp)
    bsh = batch_sharding(mesh, axis_name)
    rep = replicate(mesh)
    base = make_train_step(model, head).__wrapped__  # un-jitted body

    step = jax.jit(
        base,
        donate_argnums=(0,),
        in_shardings=(shardings, bsh, bsh, rep),
        out_shardings=(shardings, rep),
    )
    placed = jax.tree_util.tree_map(jax.device_put, state, shardings)
    return step, placed


def make_sharded_train_step_aug(
    model, head, state: RecTrainState, mesh: Mesh,
    axis_name: str = DATA_AXIS, fsdp: bool = False,
):
    """Sharded twin of make_train_step_aug: every FaceAugmentPlan leaf
    is batch-leading, so the whole in-graph augmentation (crop mask,
    cv2-resample matmuls, photometric, flip, normalize) partitions
    under the same batch sharding as the images."""
    shardings = rec_state_shardings(state, mesh, axis_name, fsdp=fsdp)
    bsh = batch_sharding(mesh, axis_name)
    rep = replicate(mesh)
    base = make_train_step_aug(model, head).__wrapped__

    step = jax.jit(
        base,
        donate_argnums=(0,),
        in_shardings=(shardings, bsh, bsh, bsh, rep),
        out_shardings=(shardings, rep),
    )
    placed = jax.tree_util.tree_map(jax.device_put, state, shardings)
    return step, placed
