"""Training: optimizer, schedule, jitted SPMD train step, fit loop.

Reference training recipe (train_mobilenetV3_ecagai.py:436-615 and the
shared epoch runner utils/utils_fit_change.py:11-64):
  * two phases — "freeze" (lr 1e-3, optionally frozen backbone, epochs
    0..freeze) and "unfreeze" (lr 1e-4), each with a FRESH
    Adam(weight_decay=5e-4) and StepLR(gamma=0.92 per epoch);
  * MultiBoxLoss(2, 0.35, 7), total = 2.0*loc + conf + landm (:475,:530);
  * torch Adam's weight_decay is L2-into-gradient (not AdamW):
    optax.add_decayed_weights BEFORE scale_by_adam reproduces it;
  * checkpoint every save_period epochs.

TPU-native: the whole step (match + loss + grad + update) is ONE jitted
SPMD program — batches sharded over the mesh 'data' axis, params
replicated, gradient psum inserted by the partitioner (no DataParallel
scatter/gather, no NCCL calls).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct

from jabd_tpu import configs, losses
from jabd_tpu.models import build_model
from jabd_tpu.ops import anchors as A
from jabd_tpu.parallel import mesh as M


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(
    lr: float,
    steps_per_epoch: int,
    gamma: float = 0.92,
    weight_decay: float = 5e-4,
    freeze_backbone: bool = False,
) -> optax.GradientTransformation:
    """torch Adam(weight_decay) + StepLR(step_size=1, gamma) per epoch."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=gamma,
        staircase=True,
    )
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    if freeze_backbone:
        # requires_grad=False on the backbone (train script :576-578).
        def label(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if any(
                    getattr(k, "key", None) == "backbone" for k in path
                )
                else "train",
                params,
            )

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label
        )
    return tx


def create_train_state(
    rng: jax.Array,
    model_cfg: configs.ModelConfig,
    train_cfg: configs.TrainConfig,
    steps_per_epoch: int,
    lr: Optional[float] = None,
    freeze_backbone: bool = False,
    image_size: Optional[int] = None,
) -> TrainState:
    model = build_model(model_cfg, mode="train")
    size = image_size or train_cfg.image_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        rng, dummy
    )
    if train_cfg.weights_init != "none":
        # Reference from-scratch init (weights_init(net, 'normal', 0.02),
        # retinaface_training.py:305-324): conv N(0, 0.02^2), BN scale
        # N(1, 0.02^2). Checkpoint/pretrained loads overwrite this.
        from jabd_tpu.models.init import reference_weights_init

        variables = dict(variables)
        variables["params"] = jax.jit(
            functools.partial(
                reference_weights_init, init_type=train_cfg.weights_init
            )
        )(jax.random.fold_in(rng, 1), variables["params"])
    tx = make_optimizer(
        lr or train_cfg.lr_freeze,
        steps_per_epoch,
        gamma=train_cfg.lr_gamma,
        weight_decay=train_cfg.weight_decay,
        freeze_backbone=freeze_backbone,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_train_step(
    model_cfg: configs.ModelConfig,
    train_cfg: configs.TrainConfig,
    mesh=None,
):
    """Builds the jitted SPMD train step.

    step(state, images [B,H,W,3], targets Targets, anchors [P,4])
      -> (new_state, metrics dict)

    `mesh`: pass the data mesh the batch is sharded over (fit() does).
    The step itself stays bare jit — GSPMD partitions the model, loss,
    and optimizer natively — but the Pallas matching kernel is an opaque
    custom call GSPMD can't split, so with a >1-device mesh the loss
    runs it per-shard under shard_map (losses.multibox_loss
    matching_mesh). Without the mesh, TPU-default Pallas matching inside
    a sharded step would fail to partition (the exact failure mode
    serving solved for its Pallas NMS, predict.py:250-284).
    """
    model = build_model(model_cfg, mode="train")
    matching_mesh = mesh if (mesh is not None and mesh.size > 1) else None
    # Presets with tap dropout (re50_dropout) need a per-step RNG; derive
    # it inside the jitted step from the seed + step counter so the step
    # signature stays pure and the stream is deterministic under resume.
    needs_dropout = model_cfg.tap_dropout > 0.0

    def forward(params, batch_stats, images, step_i):
        kwargs = {}
        if needs_dropout:
            kwargs["rngs"] = {
                "dropout": jax.random.fold_in(
                    jax.random.PRNGKey(train_cfg.seed), step_i
                )
            }
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
            **kwargs,
        )

    if train_cfg.remat:
        # Recompute activations in backward instead of storing them
        # (HBM-for-FLOPs trade; see TrainConfig.remat).
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, images, targets, anchors, step_i):
        out, mut = forward(params, batch_stats, images, step_i)
        parts = losses.multibox_loss(
            out,
            anchors,
            targets,
            overlap_threshold=train_cfg.overlap_threshold,
            neg_pos_ratio=train_cfg.neg_pos_ratio,
            variances=model_cfg.anchors.variance,
            box_loss=model_cfg.box_loss,
            matching_impl=train_cfg.matching_impl,
            matching_mesh=matching_mesh,
        )
        loss = losses.total_loss(parts, train_cfg.loc_weight)
        return loss, (parts, mut["batch_stats"])

    def _grads_and_metrics(
        state, inputs, targets, anchors, make_images=lambda x: x
    ):
        """Whole-batch or microbatched (ghost-BN) gradient computation.

        `inputs` is the image pytree (plain images, or (u8 sources, plan)
        for the device-augment path); `make_images` turns one chunk of it
        into the float training frames INSIDE the differentiated region,
        so augmentation also stays chunk-sized under microbatching.
        """
        mb = train_cfg.microbatches
        if mb <= 1:
            (loss, (parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(
                state.params, state.batch_stats, make_images(inputs),
                targets, anchors, state.step,
            )
            return grads, new_bs, {"loss": loss, **parts}

        # lax.scan over microbatches: fwd+bwd per chunk (activation
        # memory and HLO stay chunk-sized), gradients averaged, BN
        # statistics per-chunk (ghost batch norm) threaded sequentially
        # so chunk i+1's running stats build on chunk i's update.
        b = jax.tree_util.tree_leaves(inputs)[0].shape[0]
        assert b % mb == 0, (
            f"batch {b} not divisible by microbatches={mb}"
        )

        def chunked(x):
            return x.reshape((mb, b // mb) + x.shape[1:])

        inputs_c = jax.tree_util.tree_map(chunked, inputs)
        targets_c = jax.tree_util.tree_map(chunked, targets)

        def body(carry, xs):
            bs, acc_grads, i = carry
            inp, tg = xs
            (loss, (parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(
                state.params, bs, make_images(inp), tg, anchors,
                state.step * mb + i,  # distinct dropout stream per chunk
            )
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + g, acc_grads, grads
            )
            return (new_bs, acc_grads, i + 1), {"loss": loss, **parts}

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_bs, grads_sum, _), metrics_c = jax.lax.scan(
            body,
            (state.batch_stats, zero_grads, jnp.int32(0)),
            (inputs_c, targets_c),
        )
        grads = jax.tree_util.tree_map(lambda g: g / mb, grads_sum)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics_c)
        return grads, new_bs, metrics

    # Donate the state: the optimizer update writes new params/opt
    # buffers — without donation every dispatch transiently holds two
    # copies of the state and pays the extra HBM writes.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, targets, anchors):
        grads, new_bs, metrics = _grads_and_metrics(
            state, images, targets, anchors
        )
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, metrics

    if not train_cfg.device_augment:
        return step

    from jabd_tpu.data.device_augment import device_augment

    @functools.partial(jax.jit, donate_argnums=(0,))
    def aug_step(state: TrainState, images_u8, plan, targets, anchors):
        # Augmentation (MXU resample + fused HSV) runs inside the SAME
        # device program as fwd/bwd/update — XLA overlaps it with the
        # optimizer tail of the previous dispatch; the host only ships
        # uint8 sources + per-sample resample matrices. Under
        # microbatching, each scan chunk augments its own slice.
        grads, new_bs, metrics = _grads_and_metrics(
            state,
            (images_u8, plan),
            targets,
            anchors,
            make_images=lambda inp: device_augment(inp[0], inp[1]),
        )
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, metrics

    return aug_step


def _schedule_count(opt_state) -> int:
    """Step count of the lr schedule inside a (possibly multi_transform-
    wrapped) optimizer state — the source of truth for the current lr,
    robust across fresh/per-phase/resumed optimizers."""
    found = []

    def walk(x):
        if isinstance(x, optax.ScaleByScheduleState):
            found.append(int(x.count))
        elif hasattr(x, "_fields"):  # optax states are NamedTuples
            for f in x:
                walk(f)
        elif isinstance(x, (list, tuple)):
            for f in x:
                walk(f)
        elif isinstance(x, dict):
            for f in x.values():
                walk(f)

    walk(opt_state)
    return found[0] if found else 0


def fit(
    model_cfg: configs.ModelConfig,
    train_cfg: configs.TrainConfig,
    dataset,
    log_dir: str = "logs",
    mesh=None,
    checkpoint_manager=None,
    start_epoch: int = 0,
    init_state: Optional[TrainState] = None,
):
    """Two-phase training loop (freeze -> unfreeze), mirroring
    train_mobilenetV3_ecagai.py:553-615. Returns the final TrainState."""
    from jabd_tpu.data.wider import train_loader
    from jabd_tpu.utils.logging import LossHistory

    mesh = mesh or M.make_mesh_for_batch(train_cfg.batch_size)
    steps_per_epoch = max(len(dataset) // train_cfg.batch_size, 1)
    # Replicated over the mesh explicitly: under multi-host (the mesh
    # spans processes) a committed process-local array can't mix with
    # global inputs in one jit call.
    anchors = M.device_put_global(
        A.generate_anchors(
            model_cfg.anchors,
            (train_cfg.image_size, train_cfg.image_size),
        ),
        M.replicate(mesh),
    )
    step_fn = make_train_step(model_cfg, train_cfg, mesh=mesh)
    history = LossHistory(log_dir)
    # metrics.csv twin of the recognition fit (reference observability:
    # tqdm postfix shows per-loss terms + lr via utils/utils.py:24 get_lr,
    # train_mobilenetV3_ecagai.py:539-542; LossHistory only kept total
    # loss until round 4).
    import os as _os

    metrics_path = _os.path.join(log_dir, "metrics.csv")
    _os.makedirs(log_dir, exist_ok=True)
    if not _os.path.exists(metrics_path):
        with open(metrics_path, "w") as f:
            f.write("epoch,step,loss,loss_l,loss_c,loss_landm,lr\n")

    state = init_state
    # Auto-resume from the latest checkpoint (the reference resumes by
    # hand-pointing model_path at the last epoch .pth,
    # train_mobilenetV3_ecagai.py:78,450-460 — here it's automatic and
    # includes the optimizer state).
    if (
        state is None
        and checkpoint_manager is not None
        and checkpoint_manager.latest_step() is not None
    ):
        resumed_epoch = checkpoint_manager.latest_step()
        # The checkpoint saved at step s was produced by epoch s-1, so
        # it belongs to the FREEZE phase iff s-1 < freeze_epochs. A
        # `resumed_epoch < freeze_epochs` test mislabels the checkpoint
        # saved exactly AT the boundary (s == freeze_epochs, written by
        # the last freeze epoch): the restore template would carry the
        # plain-chain opt_state while the stored state is the freeze
        # phase's multi_transform tree — a structure mismatch that
        # killed auto-resume at that step.
        resume_phase_freeze = (resumed_epoch - 1) < train_cfg.freeze_epochs
        template = create_train_state(
            jax.random.PRNGKey(train_cfg.seed),
            model_cfg,
            train_cfg,
            steps_per_epoch,
            lr=(
                train_cfg.lr_freeze
                if resume_phase_freeze
                else train_cfg.lr_unfreeze
            ),
            freeze_backbone=resume_phase_freeze,
        )
        state = checkpoint_manager.restore(template)
        start_epoch = max(start_epoch, resumed_epoch)
        just_resumed = True
        print(f"resumed from checkpoint at epoch {resumed_epoch}")
    else:
        just_resumed = False
        resume_phase_freeze = None

    phase_bounds = [
        (start_epoch, train_cfg.freeze_epochs, train_cfg.lr_freeze, True),
        (
            max(train_cfg.freeze_epochs, start_epoch),
            train_cfg.total_epochs,
            train_cfg.lr_unfreeze,
            False,
        ),
    ]
    rng = jax.random.PRNGKey(train_cfg.seed)
    for first, last, lr, freeze in phase_bounds:
        if first >= last:
            if just_resumed and freeze == resume_phase_freeze:
                # The checkpoint belongs to this phase and the phase is
                # already complete (boundary resume): the NEXT phase
                # must build its optimizer FRESH (reference :564,596),
                # not inherit this phase's restored one.
                just_resumed = False
            continue
        if state is None:
            state = create_train_state(
                rng, model_cfg, train_cfg, steps_per_epoch, lr=lr,
                freeze_backbone=freeze,
            )
        elif just_resumed:
            # Mid-phase resume: the checkpoint's optimizer state (built
            # for this phase by the resume template) must survive — do
            # NOT re-init it.
            just_resumed = False
        else:
            # Fresh optimizer per phase (reference :564,596).
            tx = make_optimizer(
                lr,
                steps_per_epoch,
                gamma=train_cfg.lr_gamma,
                weight_decay=train_cfg.weight_decay,
                freeze_backbone=freeze,
            )
            state = state.replace(tx=tx, opt_state=tx.init(state.params))
        if train_cfg.fsdp and mesh.size > 1:
            # ZeRO-style placement: large params + Adam moments shard
            # over the data mesh (parallel/fsdp.py) — same train step,
            # GSPMD inserts the weight gathers / grad reduce-scatters.
            from jabd_tpu.parallel import fsdp as F

            state = F.shard_tree(state, mesh)
        else:
            state = M.replicate_tree(state, mesh)

        for epoch in range(first, last):
            t0 = time.time()
            # The lr the epoch's FIRST update uses: schedule(count) with
            # the count read from the live optimizer state (survives
            # mid-phase resume, where `epoch - first` would not).
            cur_lr = float(
                optax.exponential_decay(
                    init_value=lr,
                    transition_steps=max(steps_per_epoch, 1),
                    decay_rate=train_cfg.lr_gamma,
                    staircase=True,
                )(_schedule_count(state.opt_state))
            )
            step_metrics = []  # device-array dicts — no per-step sync
            step_losses = []  # device arrays — no per-step host sync
            if train_cfg.device_augment:
                from jabd_tpu.data.device_augment import device_train_loader

                batches = device_train_loader(
                    dataset,
                    train_cfg.batch_size,
                    bucket_hw=train_cfg.augment_bucket,
                    max_targets=train_cfg.max_targets,
                    seed=train_cfg.seed + epoch,
                )

                def to_batch(item):
                    images_u8, plan, (boxes, labels, landms, valid) = item
                    return (images_u8, plan, boxes, labels, landms, valid)
            else:
                batches = train_loader(
                    dataset,
                    train_cfg.batch_size,
                    max_targets=train_cfg.max_targets,
                    seed=train_cfg.seed + epoch,
                )

                def to_batch(item):
                    images, (boxes, labels, landms, valid) = item
                    return (
                        images.astype(np.float32),
                        None,
                        boxes,
                        labels,
                        landms,
                        valid,
                    )

            # Prefetch keeps host augmentation + H2D transfer overlapped
            # with device compute (the DataLoader pin_memory/num_workers
            # analog); per-step losses stay on device — a host sync per
            # step costs a full RTT on remote-attached TPUs.
            #
            # Bounded run-ahead: keep at most MAX_IN_FLIGHT dispatched
            # steps outstanding by value-fetching the lagged step's loss
            # scalar (a real fetch — block_until_ready can return early
            # on remote-attached backends). Unbounded async dispatch
            # collapses remote throughput: measured ~14 s/step drain
            # with ~24 queued steps vs ~2 s/step with a lagged sync at
            # the same shapes (scripts/diag_sync_loop.py, bs=96/640²).
            MAX_IN_FLIGHT = 3
            synced = 0
            for batch in M.prefetch_to_device(
                map(to_batch, batches), mesh, depth=2
            ):
                images_d, plan_d, boxes_d, labels_d, landms_d, valid_d = (
                    batch
                )
                targets = losses.Targets(
                    boxes=boxes_d, labels=labels_d, landms=landms_d,
                    valid=valid_d,
                )
                if train_cfg.device_augment:
                    state, metrics = step_fn(
                        state, images_d, plan_d, targets, anchors
                    )
                else:
                    state, metrics = step_fn(
                        state, images_d, targets, anchors
                    )
                step_losses.append(metrics["loss"])
                step_metrics.append(metrics)
                if len(step_losses) - synced > MAX_IN_FLIGHT:
                    float(step_losses[synced])
                    synced += 1
            nsteps = len(step_losses)
            mean_loss = (
                float(jnp.mean(jnp.stack(step_losses))) if nsteps else 0.0
            )
            means = {
                k: (
                    float(jnp.mean(jnp.stack([m[k] for m in step_metrics])))
                    if nsteps
                    else 0.0
                )
                for k in ("loss_l", "loss_c", "loss_landm")
            }
            history.append_loss(mean_loss)
            with open(metrics_path, "a") as f:
                f.write(
                    f"{epoch + 1},{int(state.step)},{mean_loss:.6f},"
                    f"{means['loss_l']:.6f},{means['loss_c']:.6f},"
                    f"{means['loss_landm']:.6f},{cur_lr:.8f}\n"
                )
            print(
                f"epoch {epoch + 1}/{last} loss={mean_loss:.4f} "
                f"lr={cur_lr:.6f} "
                f"({time.time() - t0:.1f}s, {nsteps} steps)"
            )
            if checkpoint_manager is not None and (
                (epoch + 1) % train_cfg.save_period == 0
            ):
                checkpoint_manager.save(epoch + 1, state)
    # Always persist the final state (the periodic save skips it when
    # total_epochs isn't a multiple of save_period — a 1-epoch CLI run
    # used to end with NO checkpoint).
    if (
        checkpoint_manager is not None
        and state is not None
        and checkpoint_manager.latest_step() != train_cfg.total_epochs
    ):
        checkpoint_manager.save(train_cfg.total_epochs, state)
    return state
