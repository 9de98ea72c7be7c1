"""Class-sharded margin-head training (recognition/parallel.py).

The reference's only distributed mode replicates the full classifier on
every rank (Lightning DDP, main.py:37-50); the class-sharded head has
no reference analog, so the anchor is INTERNAL consistency: the sharded
step on the 8-device CPU mesh must reproduce the single-device
production step, while actually sharding the kernel and its optimizer
momentum. Class padding (heads.py pad_to) must be exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jabd_tpu.parallel.mesh import make_mesh
from jabd_tpu.recognition import build_model as build_ir
from jabd_tpu.recognition import parallel as RP
from jabd_tpu.recognition.heads import build_head
from jabd_tpu.recognition.train import create_state, make_train_step

BATCH = 16
CLASSES = 64  # divisible by 8; uneven counts are pad_to-padded
SIZE = 56  # IRBackbone is input-size agnostic; small = fast on CPU


def _copy(state):
    """Donation-safe copy (the production step donates its state)."""
    return jax.tree_util.tree_map(jnp.array, state)


def _data(seed, steps=2, classes=CLASSES):
    rng = np.random.default_rng(seed)
    return [
        (
            jnp.asarray(
                rng.normal(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32
            ),
            jnp.asarray(rng.integers(0, classes, (BATCH,)), jnp.int32),
        )
        for _ in range(steps)
    ]


@pytest.fixture(scope="module")
def setup():
    model = build_ir("ir_18")
    head = build_head("adaface", class_num=CLASSES)
    state = create_state(
        jax.random.PRNGKey(0), model, head, 100, image_size=SIZE
    )
    return model, head, state


def test_sharded_step_matches_single_device(setup):
    model, head, state0 = setup
    mesh = make_mesh()
    assert mesh.devices.size == 8, "conftest should give 8 CPU devices"

    ref_step = make_train_step(model, head)
    sh_step, shd = RP.make_sharded_train_step(
        model, head, _copy(state0), mesh
    )

    # The kernel and its SGD momentum must actually be sharded along
    # the class axis; a conv param must stay replicated.
    kspec = shd.params["head"]["kernel"].sharding.spec
    assert tuple(kspec) == (None, "data"), kspec
    mom = [
        leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            shd.opt_state
        )[0]
        if "head" in RP._path_keys(path)
        and RP._path_keys(path)[-1] == "kernel"
    ]
    assert mom, "no head-kernel momentum leaf found in opt_state"
    assert all(tuple(m.sharding.spec) == (None, "data") for m in mom)
    conv_leaf = shd.params["model"]["input_conv"]["kernel"]
    assert conv_leaf.sharding.is_fully_replicated

    ref = _copy(state0)
    key = jax.random.PRNGKey(7)
    for images, labels in _data(1):
        ref, ref_m = ref_step(ref, images, labels, key)
        shd, shd_m = sh_step(shd, images, labels, key)
        np.testing.assert_allclose(
            float(ref_m["loss"]), float(shd_m["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(ref_m["acc"]), float(shd_m["acc"]), rtol=1e-6
        )

    # Final states agree leaf-for-leaf. Tolerance note: the losses match
    # to 2e-5 each step, but s=64-scaled softmax + arccos near the clip
    # boundary (derivative ~22) amplify f32 collective-reduction-order
    # noise into the gradients, so two SGD steps at lr=0.1 drift params
    # by up to ~5e-4 absolute (measured) — same trajectory, not bitwise.
    ref_flat = jax.tree_util.tree_leaves(ref.params)
    shd_flat = jax.tree_util.tree_leaves(jax.device_get(shd.params))
    assert len(ref_flat) == len(shd_flat)
    for a, b in zip(ref_flat, shd_flat):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3
        )


def test_fsdp_backbone_sharding_matches(setup):
    """tp (class-sharded head) + FSDP (backbone weight-update sharding)
    on one mesh: loss trajectory matches the plain class-sharded step,
    and large backbone params + their momentum really hold 1/8 per
    device."""
    from jabd_tpu.parallel import fsdp as F

    model, head, state0 = setup
    mesh = make_mesh()

    base_step, base = RP.make_sharded_train_step(
        model, head, _copy(state0), mesh
    )
    f_step, fshd = RP.make_sharded_train_step(
        model, head, _copy(state0), mesh, fsdp=True
    )

    # head kernel stays class-sharded; a large backbone conv shards
    # along its largest divisible axis; momentum mirrors it
    assert tuple(fshd.params["head"]["kernel"].sharding.spec) == (
        None,
        "data",
    )
    big = max(
        jax.tree_util.tree_leaves(fshd.params["model"]),
        key=lambda a: a.size,
    )
    shard = next(iter(big.addressable_shards)).data
    assert shard.size * mesh.devices.size == big.size

    key = jax.random.PRNGKey(7)
    for images, labels in _data(4):
        base, bm = base_step(base, images, labels, key)
        fshd, fm = f_step(fshd, images, labels, key)
        np.testing.assert_allclose(
            float(bm["loss"]), float(fm["loss"]), rtol=2e-5
        )
    # sharding survives the donated update (out_shardings pins it)
    shard = next(
        iter(
            max(
                jax.tree_util.tree_leaves(fshd.params["model"]),
                key=lambda a: a.size,
            ).addressable_shards
        )
    ).data
    assert shard.size * mesh.devices.size == big.size
    # params agree after gather (same tolerance rationale as the
    # class-sharded test above)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(base.params)),
        jax.tree_util.tree_leaves(jax.device_get(fshd.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3
        )


def test_head_memory_actually_sharded(setup):
    """Per-device kernel shard is C/N columns — the PartialFC memory
    claim, checked on the addressable shards themselves."""
    model, head, state0 = setup
    mesh = make_mesh()
    placed, _ = RP.shard_rec_state(_copy(state0), mesh)
    k = placed.params["head"]["kernel"]
    shard_cols = {s.data.shape[1] for s in k.addressable_shards}
    assert shard_cols == {CLASSES // 8}, shard_cols
    assert k.shape == (512, CLASSES)


def test_padded_head_exact_vs_unpadded():
    """pad_to padding is EXACT: same init rng -> identical logits on
    the real classes, -3e4 on the padding columns, zero padding grad."""
    classes = 67  # 67 % 8 != 0 (like the production 70722)
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(0, 1, (BATCH, 512)), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    norms = jnp.asarray(rng.uniform(5, 40, (BATCH, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, classes, (BATCH,)), jnp.int32)

    h_ref = build_head("cosface", class_num=classes)
    h_pad = build_head("cosface", class_num=classes, pad_to=8)
    v_ref = h_ref.init(jax.random.PRNGKey(5), emb, norms, labels)
    v_pad = h_pad.init(jax.random.PRNGKey(5), emb, norms, labels)
    assert v_pad["params"]["kernel"].shape == (512, 72)

    # Same values on the shared columns -> logits must match there.
    v_pad = jax.tree_util.tree_map(lambda x: x, v_pad)  # unfreeze copy
    v_pad["params"]["kernel"] = (
        v_pad["params"]["kernel"]
        .at[:, :classes]
        .set(v_ref["params"]["kernel"])
    )
    log_ref = h_ref.apply(v_ref, emb, norms, labels)
    log_pad = h_pad.apply(v_pad, emb, norms, labels)
    # [512, 67] vs [512, 72] matmuls vectorize differently -> last-ulp
    # reduction-order differences; padding exactness is semantic (zero
    # softmax mass + zero grad below), not bitwise.
    np.testing.assert_allclose(
        np.asarray(log_pad[:, :classes]), np.asarray(log_ref), rtol=2e-4
    )
    assert np.all(np.asarray(log_pad[:, classes:]) == -3e4)

    # CE through the padded head == CE through the unpadded head, and
    # the padding columns receive exactly zero gradient.
    import optax

    def ce(v, h):
        logits = h.apply(v, emb, norms, labels)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    l_ref = float(ce(v_ref, h_ref))
    l_pad, g_pad = jax.value_and_grad(ce)(v_pad, h_pad)
    np.testing.assert_allclose(float(l_pad), l_ref, rtol=1e-5)
    gk = np.asarray(g_pad["params"]["kernel"])
    assert np.all(gk[:, classes:] == 0.0)
    assert np.any(gk[:, :classes] != 0.0)


def test_uneven_class_count_runs_padded():
    """The production class count (70722 % 8 != 0) pattern: pad_to=8
    makes the kernel mesh-divisible and the sharded step runs."""
    mesh = make_mesh()
    model = build_ir("ir_18")
    head = build_head("cosface", class_num=67, pad_to=8)
    state = create_state(
        jax.random.PRNGKey(1), model, head, 10, image_size=SIZE
    )
    step, placed = RP.make_sharded_train_step(model, head, state, mesh)
    images, labels = _data(2, steps=1, classes=67)[0]
    placed, metrics = step(placed, images, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_unpadded_uneven_kernel_raises():
    mesh = make_mesh()
    model = build_ir("ir_18")
    head = build_head("cosface", class_num=67)
    state = create_state(
        jax.random.PRNGKey(1), model, head, 10, image_size=SIZE
    )
    with pytest.raises(ValueError, match="pad_to"):
        RP.rec_state_shardings(state, mesh)


def test_sharded_extraction_matches(rng):
    """Mesh-sharded flip-TTA feature extraction (the multi-chip analog
    of validate_IJB_S.py:59-106's per-GPU sharding) must agree with the
    single-device path, including the padded tail batch."""
    from jabd_tpu.recognition.train import extract_embeddings_tta

    model = build_ir("ir_18")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(2), jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    )
    images = rng.normal(0, 1, (6, SIZE, SIZE, 3)).astype(np.float32)

    e0, n0 = extract_embeddings_tta(model, variables, images, batch_size=4)
    mesh = make_mesh(jax.devices()[:2])
    e1, n1 = extract_embeddings_tta(
        model, variables, images, batch_size=4, mesh=mesh
    )
    assert e0.shape == e1.shape == (6, 512)
    # different XLA programs (sharded vs not): tolerance-level agreement
    np.testing.assert_allclose(e0, e1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(n0, n1, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="divide"):
        extract_embeddings_tta(
            model, variables, images, batch_size=3, mesh=mesh
        )
