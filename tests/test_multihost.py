"""Multi-host (jax.distributed) tests: a real 2-process CPU mesh.

Exercises parallel/mesh.py::init_distributed end-to-end — the DCN path
the reference reaches via Lightning DDP + NCCL (main.py:37-50,
utils.py:49-92). Two OS processes, one virtual CPU device each, form a
single global mesh and psum a data-parallel gradient.
"""

import os
import socket
import subprocess
import sys

import pytest

from jabd_tpu.parallel import mesh as M


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_grad_psum():
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # Generous: the fit() section alone compiles the train step
            # twice (freeze/unfreeze phases) per process on ONE shared
            # CPU core (~72 s single-process; contention roughly doubles
            # it).
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} grad_psum=6.0 OK" in out, out
        assert f"proc{i} sharded_head" in out, out  # tp+dp across procs

    # The production fit() ran to completion on both processes and
    # produced BIT-IDENTICAL params (same seeded data, psum-synced
    # grads): compare the printed param fingerprints.
    import re

    fps = []
    for i, out in enumerate(outs):
        m = re.search(rf"proc{i} fit step=(\d+) fp=([0-9.]+) OK", out)
        assert m, f"proc{i} fit line missing:\n{out}"
        assert int(m.group(1)) == 4, m.group(0)  # 2 epochs x 2 steps
        fps.append(m.group(2))
    assert fps[0] == fps[1], fps


@pytest.mark.slow
def test_two_process_four_device_fsdp_step():
    """2 processes x 4 devices = one 8-device global mesh (VERDICT r4
    ask #8): one step of the production train step under FSDP/ZeRO
    placement where addressable shards != global shards. The worker
    asserts 1/8 shards with only 4/8 addressable per process, sharding
    surviving the donated update, and loss + per-leaf param
    fingerprints equal to a single-device reference."""
    worker = os.path.join(
        os.path.dirname(__file__), "_multihost_fsdp_worker.py"
    )
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # Two train-step compiles per process (8-device SPMD + the
            # single-device reference) on one shared CPU core.
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    import re

    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        m = re.search(rf"proc{i} fsdp2x4 loss=([0-9.]+) OK", out)
        assert m, f"proc{i} fsdp line missing:\n{out}"
        losses.append(m.group(1))
    # same global program, same data: bit-identical printed loss
    assert losses[0] == losses[1], losses


def test_single_process_call_is_noop():
    # Must not try to spin up a coordinator (and must not swallow real
    # errors — covered by the negative test below).
    M.init_distributed()
    M.init_distributed(num_processes=1)


def test_misconfiguration_propagates():
    """A bad coordinator address must raise, not silently fall back to
    single-host (the round-1 bare `except: pass` masked this)."""
    import jax

    if jax.process_count() > 1:
        pytest.skip("already distributed")
    with pytest.raises(Exception):
        M.init_distributed(
            coordinator_address="127.0.0.1:1",  # nothing listens here
            num_processes=2,
            process_id=1,
            initialization_timeout=5,
        )
