"""Worker for the 2-process x 4-device FSDP train-step test.

Each process owns FOUR virtual CPU devices; two processes form one
8-device global mesh, so every FSDP-sharded leaf has addressable
shards != global shards — the multi-host regime `device_put_global`
and `parallel/fsdp.py::leaf_spec` exist for (VERDICT r4 ask #8). One
step of the PRODUCTION train step runs with ZeRO-style placement
across the process boundary (the DCN analog of Lightning DDP
multi-process, reference main.py:37-50 — which replicates the full
model per rank; here each process materializes only its 4 devices'
1/8-shards).

Usage: python _multihost_fsdp_worker.py <coordinator> <num_procs> <id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

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
    # Same rationale as tests/conftest.py: two processes each compile
    # the 8-device SPMD step + a single-device reference on ONE shared
    # core — the persistent cache turns re-runs from minutes into
    # seconds. Must come AFTER init_distributed: enable() touches
    # jax.default_backend(), which initializes the XLA backend, and
    # jax.distributed.initialize refuses to run after that.
    from jabd_tpu.utils import compile_cache

    compile_cache.enable(allow_cpu=True)
    n_local = 4
    n_global = num_procs * n_local
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.local_devices()) == n_local, jax.local_devices()
    assert len(jax.devices()) == n_global, jax.devices()

    import dataclasses

    from jabd_tpu import configs, losses, train
    from jabd_tpu.ops import anchors as A
    from jabd_tpu.parallel import fsdp as F

    mesh = M.make_mesh()  # 8 devices spanning both processes
    SIZE, B, G = 64, 8, 2
    mcfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    tcfg = configs.TrainConfig(batch_size=B, image_size=SIZE, max_targets=G)

    # Deterministic global batch — every process rebuilds it identically
    # and contributes only its addressable shards (device_put_global).
    rng = np.random.default_rng(0)
    images = rng.normal(0, 50, (B, SIZE, SIZE, 3)).astype(np.float32)
    cxy = rng.uniform(0.3, 0.7, (B, G, 2))
    wh = rng.uniform(0.1, 0.2, (B, G, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(
        np.float32
    )
    targets = losses.Targets(
        boxes=jnp.asarray(boxes),
        labels=jnp.ones((B, G), jnp.float32),
        landms=jnp.asarray(rng.uniform(0, 1, (B, G, 10)).astype(np.float32)),
        valid=jnp.ones((B, G), bool),
    )
    anchors_np = A.generate_anchors(mcfg.anchors, (SIZE, SIZE))

    images_d = M.shard_batch(jnp.asarray(images), mesh)
    targets_d = losses.Targets(*M.shard_batch(tuple(targets), mesh))
    anchors_d = M.device_put_global(anchors_np, M.replicate(mesh))

    def fresh_state():
        return train.create_train_state(
            jax.random.PRNGKey(0), mcfg, tcfg, steps_per_epoch=10,
            image_size=SIZE,
        )

    # --- FSDP placement across the process boundary: each process's
    # addressable view of a sharded leaf is HALF the global shard set.
    state = F.shard_tree(fresh_state(), mesh)
    F.assert_sharded(state.params, mesh)
    F.assert_sharded(state.opt_state, mesh)
    big = max(jax.tree_util.tree_leaves(state.params), key=lambda a: a.size)
    local = sum(s.data.size for s in big.addressable_shards)
    assert local * num_procs == big.size, (local, big.size)

    step = train.make_train_step(mcfg, tcfg, mesh=mesh)
    # Compile FIRST, then align both processes at a coordination-service
    # barrier (minutes of timeout) before the first EXECUTION: the gloo
    # CPU-collective context does its key-value rendezvous with a hard
    # 30 s deadline at first use, and a loaded 1-core host can skew two
    # fresh processes' compile+startup by more than that (observed:
    # DEADLINE_EXCEEDED on GetKeyValue when the full suite ran this
    # test; standalone it passed). Compiling before the barrier leaves
    # only milliseconds of skew at gloo init.
    compiled = step.lower(state, images_d, targets_d, anchors_d).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(
        "fsdp2x4_compiled", timeout_in_ms=600_000
    )
    state, metrics = compiled(state, images_d, targets_d, anchors_d)
    loss = float(np.asarray(metrics["loss"].addressable_data(0)))
    # sharding survives the donated update (params AND Adam moments)
    F.assert_sharded(state.params, mesh)
    F.assert_sharded(state.opt_state, mesh)

    # --- single-device reference: same step fn, same seed, same batch,
    # everything process-local. Pins that the cross-process FSDP layout
    # computes the numbers, not just shapes.
    step1 = train.make_train_step(mcfg, tcfg)
    dev = jax.local_devices()[0]
    put = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, dev), t
    )
    sref, mref = step1(
        put(fresh_state()),
        put(jnp.asarray(images)),
        losses.Targets(*put(tuple(targets))),
        put(jnp.asarray(anchors_np)),
    )
    ref_loss = float(mref["loss"])
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)

    # Per-leaf fingerprints of the updated params, computed as a global
    # SPMD reduction (replicated scalars readable on every process).
    fp_fn = jax.jit(
        lambda t: jax.tree_util.tree_map(
            lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))), t
        )
    )
    fps = fp_fn(state.params)
    fps_ref = jax.device_get(fp_fn(sref.params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            # reduce-scatter vs all-reduce layouts drift ~1e-6 relative
            np.asarray(a.addressable_data(0)), np.asarray(b),
            rtol=2e-4, atol=1e-5,
        ),
        fps,
        fps_ref,
    )
    print(
        f"proc{proc_id} fsdp2x4 loss={loss:.6f} OK",
        flush=True,
    )


if __name__ == "__main__":
    main()
