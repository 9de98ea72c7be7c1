"""Device mesh + sharding utilities — the distributed backbone.

Replaces the reference's parallelism surface (SURVEY.md section 2.5):
`nn.DataParallel` single-process scatter/gather
(train_mobilenetV3_ecagai.py:464, predict.py:109) and Lightning DDP /
torch.distributed NCCL all_gather (main.py:37-50, utils.py:49-92).

TPU-native equivalent: one `jax.sharding.Mesh` over the chips; batches are
sharded over the 'data' axis, parameters are replicated, and XLA's SPMD
partitioner inserts the psum gradient reductions over ICI automatically
when a jitted train step consumes sharded batches with replicated params.
Multi-host (DCN) works through the same API once `jax.distributed` is
initialized — the mesh just spans all processes' devices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    initialization_timeout: Optional[int] = None,
) -> None:
    """Multi-host initialization (DCN across slices).

    The TPU analog of the reference's torch.distributed/NCCL setup
    (main.py:37-50): after this, jax.devices() spans every host's chips
    and the same Mesh/jit SPMD code scales across hosts unchanged.

    Explicit single-process calls (no coordinator, num_processes in
    {None, 1}) are a no-op; a second call on an initialized runtime is
    tolerated. Everything else (bad coordinator address, rank mismatch,
    dead peer) PROPAGATES — masking a misconfigured multi-host job
    behind a silent fallback to single-host is how you lose a cluster
    run to a typo.
    """
    import jax

    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process SPMD needs no distributed runtime
    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        # jax <=0.4 raises "...already initialized"; jax 0.9 raises
        # "distributed.initialize should only be called once."
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return
        raise


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(
    batch_size: int, axis_name: str = DATA_AXIS
) -> Mesh:
    """Largest mesh whose device count divides batch_size (a sharded batch
    axis must split evenly across the mesh)."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def device_put_global(x, sh: NamedSharding):
    """device_put that also works when `sh` spans multiple PROCESSES.

    Multi-host rule: every process passes the same GLOBAL value (the
    data pipeline is seed-deterministic, so each host rebuilds the full
    batch identically) and contributes only its addressable shards —
    `jax.device_put` alone rejects shardings with non-addressable
    devices. Single-process falls through to plain device_put."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx]
        )
    return jax.device_put(x, sh)


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put every array in `batch` sharded on its leading axis
    (multi-process safe: see device_put_global)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: device_put_global(x, sh), batch
    )


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicate(mesh)
    return jax.tree_util.tree_map(
        lambda x: device_put_global(x, sh), tree
    )


def prefetch_to_device(iterator, mesh: Mesh, depth: int = 2):
    """Overlap host batch prep with device compute: keep `depth` batches
    in flight, each already device_put with the batch axis sharded.

    The TPU replacement for the reference DataLoader's pin_memory +
    num_workers prefetch (train_mobilenetV3_ecagai.py:568-569)."""
    import collections

    queue = collections.deque()
    sh = batch_sharding(mesh)

    def put(batch):
        return jax.tree_util.tree_map(
            lambda x: device_put_global(x, sh), batch
        )

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
