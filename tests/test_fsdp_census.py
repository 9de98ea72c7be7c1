"""FSDP sharding census at a realistic parameter set (VERDICT r4 #6).

`parallel/fsdp.py`'s memory claim — params + Adam moments 1/N per chip
for the big ResNet presets — was previously asserted only on toy
mnet025 trees. This census builds `re152_4level`'s REAL parameter tree
(the ~60M-param preset the FSDP docstring names) via `jax.eval_shape`
(shapes only — no 60M-param materialization in the fast suite), applies
the production `leaf_spec` rule under an 8-way mesh, and pins:

  * >= 90% of parameter BYTES shard 1/8 (Adam's mu/nu mirror the param
    shapes leaf-for-leaf, so the moment fraction is identical by
    construction — `shard_tree` applies the same rule to opt_state);
  * every BatchNorm vector replicates (sharding a [C] vector saves
    nothing and costs an all-gather per use);
  * the replicated residue is NAMED and consists only of sub-32KB
    leaves or 8-indivisible shapes — nothing big silently replicates.

Reference contrast: nn.DataParallel holds a full model + optimizer copy
per rank (train_mobilenetV3_ecagai.py:464), so per-device memory never
scales with the cluster.
"""

import functools

import jax
import jax.numpy as jnp

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.parallel import fsdp as F

N_SHARDS = 8


def _census(preset: str):
    mcfg = configs.get_model_config(preset)
    model = build_model(mcfg, mode="train")
    shapes = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    sharded_b = repl_b = 0
    residue = []  # (path, shape, bytes) of replicated leaves
    for path, leaf in jax.tree_util.tree_leaves_with_path(shapes["params"]):
        nbytes = leaf.size * 4  # f32 train-state bytes
        spec = F.leaf_spec(leaf.shape, N_SHARDS)
        if spec == jax.sharding.PartitionSpec():
            repl_b += nbytes
            residue.append((jax.tree_util.keystr(path), leaf.shape, nbytes))
        else:
            # the spec must name exactly one axis, and that axis must
            # divide the mesh — i.e. the shard really is 1/8
            axes = [i for i, a in enumerate(spec) if a is not None]
            assert len(axes) == 1
            assert leaf.shape[axes[0]] % N_SHARDS == 0
            sharded_b += nbytes
    return shapes, sharded_b, repl_b, residue


def test_re152_census_params_and_moments_mostly_shard():
    shapes, sharded_b, repl_b, residue = _census("re152_4level")
    total_b = sharded_b + repl_b
    # realistic scale: the docstring's ~60M-param claim
    assert total_b / 4 > 55e6, f"param count {total_b / 4 / 1e6:.1f}M"
    frac = sharded_b / total_b
    assert frac >= 0.90, (
        f"only {frac:.1%} of param bytes shard; residue: "
        f"{sorted(residue, key=lambda r: -r[2])[:10]}"
    )
    # Name the residue: every replicated leaf must be either small
    # (< MIN_SHARD_SIZE elements) or have no 8-divisible axis. On
    # re152 the residue is exactly the BN/bias/scale vector population
    # plus conv1's [7,7,3,64]-style first layer if below the floor.
    for path, shape, nbytes in residue:
        small = (nbytes // 4) < F.MIN_SHARD_SIZE
        divisible = any(d % N_SHARDS == 0 for d in shape)
        assert small or not divisible, (
            f"{path} {shape} replicates but is large AND 8-divisible"
        )

    # every BatchNorm param vector replicates (1-D, small)
    bn_leaves = [
        (p, s)
        for p, s in (
            (jax.tree_util.keystr(path), leaf.shape)
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                shapes["params"]
            )
        )
        if "bn" in p.lower() or "batchnorm" in p.lower()
    ]
    assert bn_leaves, "no BN leaves found — naming convention changed?"
    residue_paths = {p for p, _, _ in residue}
    for p, s in bn_leaves:
        assert p in residue_paths, f"BN leaf {p} {s} unexpectedly sharded"


def test_re152_census_batch_stats_replicate():
    shapes, *_ = _census("re152_4level")
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        shapes["batch_stats"]
    ):
        assert F.leaf_spec(leaf.shape, N_SHARDS) == (
            jax.sharding.PartitionSpec()
        ), f"batch stat {jax.tree_util.keystr(path)} should replicate"


def test_flagship_census_depthwise_kernels():
    """The MobileNet flagship's depthwise kernels are [k,k,1,C-multiplier]
    shaped — the census documents how the rule treats them (C shards when
    8-divisible) and that the overall fraction is still useful."""
    _, sharded_b, repl_b, residue = _census("jabd_flagship")
    frac = sharded_b / (sharded_b + repl_b)
    # the flagship is tiny (1.3M params) and vector-heavy: the honest
    # number is lower than re152's, but the big expand/project convs
    # must still shard
    assert frac >= 0.5, (
        f"{frac:.1%}; residue: {sorted(residue, key=lambda r: -r[2])[:6]}"
    )
