"""Worker process for the 2-process jax.distributed test.

Each process owns ONE virtual CPU device; together they form a 2-device
global mesh over the distributed runtime (the DCN analog). The worker
computes a data-parallel "gradient": d/dw sum(w * x) with x sharded over
the global batch axis — the cross-process reduction is exactly the psum
XLA inserts for DP gradient sync (SURVEY.md section 2.5).

Usage: python _multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from jabd_tpu.parallel import mesh as M  # noqa: E402


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    M.init_distributed(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == num_procs, jax.devices()

    mesh = M.make_mesh()  # global: one device per process
    # Local shard: process p contributes a batch of (p+1)s.
    x_local = np.full((2, 4), proc_id + 1, np.float32)
    x = multihost_utils.host_local_array_to_global_array(
        x_local, mesh, P(M.DATA_AXIS)
    )
    w = jax.device_put(jnp.ones((4,), jnp.float32), M.replicate(mesh))

    @jax.jit
    def grad_fn(w, x):
        return jax.grad(lambda w: jnp.sum(w * x))(w)

    g = grad_fn(w, x)  # replicated [4]: sum over the global batch
    # Replicated output: every process holds the full value on its own
    # device — read the local copy.
    g_host = np.asarray(g.addressable_data(0))
    expected = 2.0 * sum(p + 1 for p in range(num_procs))
    np.testing.assert_allclose(g_host, expected)
    print(f"proc{proc_id} grad_psum={float(g_host.flat[0])} OK")

    # --- Class-sharded margin head ACROSS processes (tp+dp over DCN):
    # the recognition/parallel.py layout with the classifier kernel
    # sharded over the same 2-process mesh the batch rides. Loss and
    # the local kernel-gradient shard must match a single-device
    # reference over the full global batch (all inputs deterministic,
    # so every process can rebuild the reference locally).
    import optax

    from jabd_tpu.recognition.heads import build_head

    D, C, BL = 8, 16, 2  # embedding dim, classes, local batch
    head = build_head("cosface", embedding_size=D, class_num=C)
    rngk = jax.random.PRNGKey(0)

    def local_emb(p):
        e = np.asarray(
            jax.random.normal(jax.random.fold_in(rngk, p), (BL, D)),
            np.float32,
        )
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    el = local_emb(proc_id)
    ll = np.arange(BL, dtype=np.int32) + proc_id * BL
    emb = multihost_utils.host_local_array_to_global_array(
        el, mesh, P(M.DATA_AXIS)
    )
    labels = multihost_utils.host_local_array_to_global_array(
        ll, mesh, P(M.DATA_AXIS)
    )
    norms1 = multihost_utils.host_local_array_to_global_array(
        np.ones((BL, 1), np.float32), mesh, P(M.DATA_AXIS)
    )
    vh = head.init(
        rngk,
        jnp.asarray(el),
        jnp.ones((BL, 1), jnp.float32),
        jnp.asarray(ll),
    )
    k_host = np.asarray(vh["params"]["kernel"])  # deterministic init
    ksh = NamedSharding(mesh, P(None, M.DATA_AXIS))
    k = jax.make_array_from_callback(
        k_host.shape, ksh, lambda idx: k_host[idx]
    )

    def loss_fn(kern, e, n, y):
        logits = head.apply({"params": {"kernel": kern}}, e, n, y)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()

    loss, gk = jax.jit(jax.value_and_grad(loss_fn))(k, emb, norms1, labels)

    # Single-device reference over the full global batch.
    e_full = jnp.asarray(np.concatenate([local_emb(p) for p in range(num_procs)]))
    y_full = jnp.arange(BL * num_procs, dtype=jnp.int32)
    n_full = jnp.ones((BL * num_procs, 1), jnp.float32)
    ref_loss, ref_gk = jax.value_and_grad(loss_fn)(
        jnp.asarray(k_host), e_full, n_full, y_full
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    shard = gk.addressable_shards[0]
    np.testing.assert_allclose(
        np.asarray(shard.data),
        np.asarray(ref_gk)[shard.index],
        rtol=1e-4,
        atol=1e-7,
    )
    print(f"proc{proc_id} sharded_head loss={float(loss):.4f} OK")

    # --- The PRODUCTION fit() loop across processes. Multi-host data
    # rule (parallel/mesh.py::device_put_global): the input pipeline is
    # seed-deterministic, so every host rebuilds the identical global
    # batch and contributes only its devices' shards. Runs 2 epochs
    # through the freeze->unfreeze phase transition (fresh optimizer on
    # global params); the resulting params must be bit-identical across
    # processes (same program, same data, psum-synced grads).
    import dataclasses
    import tempfile

    import cv2

    from jabd_tpu import configs
    from jabd_tpu import train as T
    from jabd_tpu.data.wider import WiderFaceDataset

    root = tempfile.mkdtemp(prefix=f"mh_fit_p{proc_id}_")
    tree_rng = np.random.default_rng(7)  # SAME content on every process
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    lines = []
    for i in range(4):
        h, w = 96, 112
        img = np.full((h, w, 3), 30, np.uint8)
        img += tree_rng.integers(0, 10, (h, w, 3), np.uint8)
        s, x, y = 32, 10 + 8 * i, 12
        img[y : y + s, x : x + s] = 200
        name = f"img_{i}.jpg"
        cv2.imwrite(os.path.join(root, "images", name), img)
        lm = " ".join(["-1.0 -1.0 -1.0"] * 5)
        lines.append(f"# {name}")
        lines.append(f"{x} {y} {s} {s} {lm} 1.0")
    with open(os.path.join(root, "label.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    tcfg = configs.TrainConfig(
        batch_size=2,
        image_size=64,
        max_targets=4,
        total_epochs=2,
        freeze_epochs=1,
        save_period=100,
    )
    ds = WiderFaceDataset(os.path.join(root, "label.txt"), input_size=64)
    state = T.fit(
        mcfg, tcfg, ds, log_dir=os.path.join(root, "logs"), mesh=mesh
    )
    fp = float(
        jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
            state.params,
            jnp.float32(0.0),
        )
    )
    print(f"proc{proc_id} fit step={int(state.step)} fp={fp:.6f} OK")


if __name__ == "__main__":
    main()
