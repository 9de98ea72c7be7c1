"""ZeRO/FSDP-style parameter + optimizer sharding over the data mesh.

The reference replicates every parameter (and every Adam moment) on
every GPU — `nn.DataParallel` (train_mobilenetV3_ecagai.py:464) and
Lightning DDP (main.py:37-50) both hold a full model copy per rank, so
per-device memory never scales with the cluster. On TPU the mesh +
GSPMD turn the memory-scaling version into a PLACEMENT decision: shard
each large parameter (and, through the same rule, its Adam mu/nu)
along its largest mesh-divisible axis over the SAME 1-D data mesh the
batch rides. XLA's SPMD partitioner then all-gathers weights where the
forward consumes them, reduce-scatters the matching gradient shards,
and runs the optimizer update on 1/N of every tensor per chip —
weight-update sharding / ZeRO-3 semantics, with zero changes to the
train step itself (`train.make_train_step` stays bare jit).

Numerically identical to replicated DP (tests/test_fsdp.py pins loss
and updated params); per-chip param + optimizer memory drops to
~1/mesh for every sharded leaf. No reference analog. Most useful for
the ResNet-152 presets (re152_4level: ~60M params -> ~720 MB of
f32 param+Adam state replicated; sharded it rides ICI instead of HBM).

Beyond-reference but TPU-canonical: this is the "weight-update
sharding" recipe from the scaling playbook — FSDP on a data mesh is
sharding annotations, not a wrapper class.
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jabd_tpu.parallel import mesh as M

# Leaves smaller than this stay replicated: sharding a [C]-sized BN
# vector saves nothing and costs an all-gather per use. 8192 f32 = 32 KB.
MIN_SHARD_SIZE = 8192


def leaf_spec(shape, n_shards: int, min_size: int = MIN_SHARD_SIZE) -> P:
    """PartitionSpec sharding the LARGEST n-divisible axis of `shape`
    along the data axis; replicated when too small or nothing divides."""
    if math.prod(shape) < min_size:
        return P()
    divisible = [d for d in range(len(shape)) if shape[d] % n_shards == 0]
    if not divisible:
        return P()
    best = max(divisible, key=lambda d: shape[d])
    spec: list = [None] * len(shape)
    spec[best] = M.DATA_AXIS
    return P(*spec)


def tree_shardings(
    tree: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE
) -> Any:
    """Per-leaf NamedShardings for `tree` under the FSDP rule."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, leaf_spec(getattr(x, "shape", ()), mesh.size, min_size)
        ),
        tree,
    )


def shard_tree(tree: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """device_put every leaf with its FSDP sharding (multi-process safe —
    same global-value contract as mesh.device_put_global).

    Apply to the whole TrainState: params and the optimizer's mu/nu
    (same shapes -> same specs) shard; BN stats, schedule counts, and
    other small state replicate.
    """
    return jax.tree_util.tree_map(
        lambda x: M.device_put_global(
            x,
            NamedSharding(
                mesh, leaf_spec(getattr(x, "shape", ()), mesh.size, min_size)
            ),
        ),
        tree,
    )


def assert_sharded(tree: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Sanity check (used by tests + dryrun): every leaf the rule says to
    shard actually holds 1/mesh of its elements per device."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        spec = leaf_spec(leaf.shape, mesh.size, min_size)
        if spec == P():
            continue
        shard = next(iter(leaf.addressable_shards)).data
        if shard.size * mesh.size != leaf.size:
            raise AssertionError(
                f"{jax.tree_util.keystr(path)}: expected 1/{mesh.size} "
                f"shards, got shard {shard.shape} of {leaf.shape}"
            )
