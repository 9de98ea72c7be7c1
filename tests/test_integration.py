"""Integration tests: remat train step, full fit() epoch over a synthetic
WIDER tree, sharded batched inference over the 8-device mesh, and
prefetch_to_device."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jabd_tpu import configs, losses, train
from jabd_tpu.models import build_model
from jabd_tpu.ops import anchors as A
from jabd_tpu.parallel import mesh as M
from jabd_tpu.predict import detect_batch
from tests.conftest import random_boxes

pytestmark = pytest.mark.slow  # compile-heavy module

from tests.test_data import wider_tree  # noqa: F401  (fixture)

SIZE = 64


@pytest.fixture(scope="module")
def tiny_cfg():
    return dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )


def test_remat_train_step_matches_plain(rng, tiny_cfg):
    tcfg = configs.TrainConfig(batch_size=2, image_size=SIZE, max_targets=4)
    tcfg_r = dataclasses.replace(tcfg, remat=True)
    state = train.create_train_state(
        jax.random.PRNGKey(0), tiny_cfg, tcfg, steps_per_epoch=10,
        image_size=SIZE,
    )
    anchors = jnp.asarray(A.generate_anchors(tiny_cfg.anchors, (SIZE, SIZE)))
    images = jnp.asarray(rng.normal(0, 50, (2, SIZE, SIZE, 3)).astype(np.float32))
    boxes = np.stack([random_boxes(rng, 3) for _ in range(2)])
    targets = losses.Targets(
        boxes=jnp.asarray(boxes),
        labels=jnp.ones((2, 3)),
        landms=jnp.asarray(rng.uniform(0, 1, (2, 3, 10)).astype(np.float32)),
        valid=jnp.ones((2, 3), bool),
    )
    step_plain = train.make_train_step(tiny_cfg, tcfg)
    step_remat = train.make_train_step(tiny_cfg, tcfg_r)
    # The step donates its state argument — deep-copy for the first
    # call so the second can reuse the same values.
    state_copy = jax.tree_util.tree_map(jnp.array, state)
    _, m1 = step_plain(state_copy, images, targets, anchors)
    _, m2 = step_remat(state, images, targets, anchors)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )


def test_fit_one_epoch_synthetic(tmp_path, wider_tree, tiny_cfg):  # noqa: F811
    """One full fit() epoch over the synthetic WIDER tree: data pipeline ->
    SPMD steps -> loss history -> checkpoint save."""
    from jabd_tpu.data import WiderFaceDataset
    from jabd_tpu.utils.checkpoint import CheckpointManager

    ds = WiderFaceDataset(wider_tree, input_size=SIZE)
    tcfg = configs.TrainConfig(
        batch_size=2,
        image_size=SIZE,
        freeze_epochs=0,
        total_epochs=1,
        max_targets=8,
        save_period=1,
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state = train.fit(
        tiny_cfg,
        tcfg,
        ds,
        log_dir=str(tmp_path / "logs"),
        checkpoint_manager=mgr,
    )
    assert state is not None
    assert int(state.step) >= 1
    assert mgr.latest_step() == 1
    # metrics.csv twin (VERDICT r3 #7): epoch/loss-parts/lr columns, lr
    # at epoch 1 == lr_unfreeze * gamma^0 (freeze_epochs=0).
    lines = (tmp_path / "logs" / "metrics.csv").read_text().splitlines()
    assert lines[0] == "epoch,step,loss,loss_l,loss_c,loss_landm,lr"
    row = lines[1].split(",")
    assert int(row[0]) == 1 and float(row[2]) > 0
    assert abs(float(row[6]) - tcfg.lr_unfreeze) < 1e-12


def test_sharded_batched_inference(tiny_cfg, rng):
    """detect_batch with the batch sharded across the 8-device mesh — the
    multi-chip WIDER val sweep configuration."""
    import functools

    mesh = M.make_mesh()
    model = build_model(tiny_cfg, mode="eval")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    )
    variables = M.replicate_tree(variables, mesh)
    anchors = jnp.asarray(A.generate_anchors(tiny_cfg.anchors, (SIZE, SIZE)))
    pcfg = configs.PredictConfig(
        confidence=0.02, input_shape=(SIZE, SIZE), max_detections=32,
        pre_nms_topk=64,
    )
    images = jnp.asarray(
        rng.normal(0, 50, (8, SIZE, SIZE, 3)).astype(np.float32)
    )
    images = M.shard_batch(images, mesh)
    dets, valid = detect_batch(
        functools.partial(model.apply),
        variables,
        images,
        anchors,
        pcfg,
        variances=tiny_cfg.anchors.variance,
        use_pallas=False,
    )
    assert dets.shape == (8, 32, 15)
    assert len(images.sharding.device_set) == 8


def test_prefetch_to_device():
    mesh = M.make_mesh()
    batches = [np.ones((8, 4), np.float32) * i for i in range(5)]
    out = list(M.prefetch_to_device(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b)[0, 0]) == float(i)
        assert len(b.sharding.device_set) == 8


def test_fit_auto_resume(tmp_path, wider_tree, tiny_cfg):  # noqa: F811
    """fit() resumes from the latest checkpoint automatically."""
    from jabd_tpu.data import WiderFaceDataset
    from jabd_tpu.utils.checkpoint import CheckpointManager

    ds = WiderFaceDataset(wider_tree, input_size=SIZE)
    tcfg = configs.TrainConfig(
        batch_size=2, image_size=SIZE, freeze_epochs=0, total_epochs=1,
        max_targets=8, save_period=1,
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    train.fit(tiny_cfg, tcfg, ds, log_dir=str(tmp_path / "logs"),
              checkpoint_manager=mgr)
    assert mgr.latest_step() == 1
    # Second fit with total_epochs=2 resumes at epoch 1, trains 1 more.
    tcfg2 = configs.TrainConfig(
        batch_size=2, image_size=SIZE, freeze_epochs=0, total_epochs=2,
        max_targets=8, save_period=1,
    )
    state = train.fit(tiny_cfg, tcfg2, ds, log_dir=str(tmp_path / "logs2"),
                      checkpoint_manager=mgr)
    assert mgr.latest_step() == 2
    assert int(state.step) >= 2
    # Resumed epoch 2's lr reflects the RESTORED schedule count: one
    # epoch of decay into the unfreeze phase (gamma^1), not gamma^0.
    lines = (tmp_path / "logs2" / "metrics.csv").read_text().splitlines()
    row = lines[1].split(",")
    assert int(row[0]) == 2
    expect = tcfg2.lr_unfreeze * tcfg2.lr_gamma
    assert abs(float(row[6]) - expect) / expect < 1e-6


def test_fit_resume_at_phase_boundary(tmp_path, wider_tree, tiny_cfg):  # noqa: F811
    """Auto-resume from the checkpoint saved exactly AT the
    freeze->unfreeze boundary (step == freeze_epochs). That checkpoint
    was written BY the last freeze epoch, so its opt_state is the
    freeze phase's multi_transform tree: the restore template must be
    built frozen (a `resumed_epoch < freeze_epochs` test mislabeled it
    and the restore died on the tree-structure mismatch), and the
    unfreeze phase must then start from a FRESH optimizer (reference
    train_mobilenetV3_ecagai.py:564,596), not inherit the frozen one."""
    import optax

    from jabd_tpu.data import WiderFaceDataset
    from jabd_tpu.utils.checkpoint import CheckpointManager

    ds = WiderFaceDataset(wider_tree, input_size=SIZE)
    tcfg = configs.TrainConfig(
        batch_size=2, image_size=SIZE, freeze_epochs=1, total_epochs=1,
        max_targets=8, save_period=1,
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    train.fit(tiny_cfg, tcfg, ds, log_dir=str(tmp_path / "logs"),
              checkpoint_manager=mgr)
    assert mgr.latest_step() == 1  # saved by the last FREEZE epoch

    tcfg2 = dataclasses.replace(tcfg, total_epochs=2)
    state = train.fit(tiny_cfg, tcfg2, ds, log_dir=str(tmp_path / "logs2"),
                      checkpoint_manager=mgr)
    assert mgr.latest_step() == 2
    # The unfreeze phase ran on a FRESH plain (non-multi_transform)
    # optimizer: its Adam moments exist for backbone leaves too, and
    # the schedule count restarted at 0 for the phase (one epoch of
    # steps afterwards).
    steps_per_epoch = max(len(ds) // tcfg2.batch_size, 1)
    assert train._schedule_count(state.opt_state) == steps_per_epoch
    assert not isinstance(
        state.opt_state, optax.MultiTransformState
    ), type(state.opt_state)
    # epoch 2's logged lr is the unfreeze phase's FRESH schedule at
    # count 0 (gamma^0), not a continuation of the freeze schedule
    lines = (tmp_path / "logs2" / "metrics.csv").read_text().splitlines()
    row = lines[1].split(",")
    assert int(row[0]) == 2
    expect = tcfg2.lr_unfreeze
    assert abs(float(row[6]) - expect) / expect < 1e-6


def test_fit_device_augment_epoch(tmp_path, wider_tree, tiny_cfg):  # noqa: F811
    """fit() with TrainConfig.device_augment: device loader -> plan
    batches -> prefetch -> jitted augment+train steps."""
    from jabd_tpu.data import WiderFaceDataset

    ds = WiderFaceDataset(wider_tree, input_size=SIZE)
    tcfg = configs.TrainConfig(
        batch_size=2,
        image_size=SIZE,
        freeze_epochs=0,
        total_epochs=1,
        max_targets=8,
        device_augment=True,
        augment_bucket=(128, 128),
    )
    state = train.fit(
        tiny_cfg, tcfg, ds, log_dir=str(tmp_path / "logs_da")
    )
    assert state is not None
    assert int(state.step) >= 1
