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


if __name__ == "__main__":
    main()
