"""FSDP/ZeRO-style parameter + optimizer sharding (parallel/fsdp.py).

The reference replicates the model per rank (nn.DataParallel,
train_mobilenetV3_ecagai.py:464; Lightning DDP main.py:37-50). The FSDP
placement shards every large param and its Adam moments along the data
mesh; the train step itself is unchanged (bare jit), GSPMD inserting
the weight gathers / gradient reduce-scatters. These tests pin:
numerical identity with replicated DP, real 1/8 memory shards, and
sharding preserved across the donated optimizer update.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from jabd_tpu import configs, losses, train
from jabd_tpu.ops import anchors as A
from jabd_tpu.parallel import fsdp as F
from jabd_tpu.parallel import mesh as M
from tests.test_data import wider_tree  # noqa: F401  (fixture)

pytestmark = pytest.mark.slow  # compile-heavy module

SIZE = 64


def test_leaf_spec_rule():
    n = 8
    # large conv kernel: largest divisible axis (out-channels) shards
    assert F.leaf_spec((3, 3, 64, 128), n) == P(None, None, None, "data")
    # in-channels larger than out: shard in-channels
    assert F.leaf_spec((3, 3, 256, 64), n) == P(None, None, "data", None)
    # small BN vector: replicated regardless of divisibility
    assert F.leaf_spec((64,), n) == P()
    # large but nothing divides: replicated
    assert F.leaf_spec((9001, 3), n) == P()
    # scalars: replicated
    assert F.leaf_spec((), n) == P()


@pytest.fixture(scope="module")
def setup():
    mesh = M.make_mesh()
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    tcfg = configs.TrainConfig(
        batch_size=8, image_size=SIZE, max_targets=4
    )
    step = train.make_train_step(mcfg, tcfg)
    anchors = jnp.asarray(
        A.generate_anchors(mcfg.anchors, (SIZE, SIZE))
    )
    rng = np.random.default_rng(0)
    images = rng.normal(0, 50, (8, SIZE, SIZE, 3)).astype(np.float32)
    g = 2
    cxy = rng.uniform(0.3, 0.7, (8, g, 2))
    wh = rng.uniform(0.1, 0.2, (8, g, 2))
    boxes = np.concatenate(
        [cxy - wh / 2, cxy + wh / 2], -1
    ).astype(np.float32)
    targets = losses.Targets(
        boxes=jnp.asarray(boxes),
        labels=jnp.ones((8, g), jnp.float32),
        landms=jnp.asarray(
            rng.uniform(0, 1, (8, g, 10)).astype(np.float32)
        ),
        valid=jnp.ones((8, g), bool),
    )
    images_d = M.shard_batch(jnp.asarray(images), mesh)
    targets_d = losses.Targets(*M.shard_batch(tuple(targets), mesh))

    def fresh_state():
        return train.create_train_state(
            jax.random.PRNGKey(0), mcfg, tcfg, steps_per_epoch=10,
            image_size=SIZE,
        )

    return mesh, step, anchors, images_d, targets_d, fresh_state


def test_fsdp_matches_replicated_two_steps(setup):
    mesh, step, anchors, images_d, targets_d, fresh_state = setup

    srep = M.replicate_tree(fresh_state(), mesh)
    srep, m1 = step(srep, images_d, targets_d, anchors)
    srep, m2 = step(srep, images_d, targets_d, anchors)

    sf = F.shard_tree(fresh_state(), mesh)
    sf, f1 = step(sf, images_d, targets_d, anchors)
    sf, f2 = step(sf, images_d, targets_d, anchors)

    np.testing.assert_allclose(
        float(f1["loss"]), float(m1["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(f2["loss"]), float(m2["loss"]), rtol=1e-4
    )
    # updated params identical after gather (two full update cycles:
    # grads, Adam moments, weight decay all went through the sharded
    # layout)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            # atol 1e-5: different grad reduction layouts (reduce-
            # scatter vs all-reduce) give ~3e-6 f32 drift on a handful
            # of near-zero weights after two update cycles.
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        srep.params,
        sf.params,
    )


def test_fsdp_memory_actually_sharded(setup):
    mesh, step, anchors, images_d, targets_d, fresh_state = setup
    sf = F.shard_tree(fresh_state(), mesh)
    F.assert_sharded(sf.params, mesh)
    F.assert_sharded(sf.opt_state, mesh)
    # at least one leaf really holds 1/8 per device, and the Adam
    # moments follow the same rule as their params
    big = max(
        jax.tree_util.tree_leaves(sf.params), key=lambda a: a.size
    )
    assert big.size >= F.MIN_SHARD_SIZE
    shard = next(iter(big.addressable_shards)).data
    assert shard.size * mesh.size == big.size

    # sharding must SURVIVE the donated optimizer update — a step that
    # silently re-replicated would pass parity while scaling nothing
    sf, _ = step(sf, images_d, targets_d, anchors)
    F.assert_sharded(sf.params, mesh)
    F.assert_sharded(sf.opt_state, mesh)


def test_fit_fsdp_smoke(tmp_path, wider_tree):  # noqa: F811
    """One tiny fit() epoch with TrainConfig.fsdp=True — the CLI path:
    placement happens inside fit(), and the returned state is still
    sharded."""
    from jabd_tpu.data import WiderFaceDataset

    # 2-device mesh: the synthetic tree has 2 images and the sharded
    # batch must divide the mesh (also exercises the rule at mesh!=8).
    mesh = M.make_mesh(jax.devices()[:2])
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    tcfg = configs.TrainConfig(
        batch_size=2,
        image_size=SIZE,
        total_epochs=1,
        freeze_epochs=0,
        max_targets=8,
        fsdp=True,
    )
    ds = WiderFaceDataset(wider_tree, input_size=SIZE)
    state = train.fit(
        mcfg, tcfg, ds, log_dir=str(tmp_path), mesh=mesh
    )
    F.assert_sharded(state.params, mesh)
    F.assert_sharded(state.opt_state, mesh)
    assert int(state.step) >= 1
