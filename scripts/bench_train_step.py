"""Flagship train-step throughput sweep on the real TPU.

Chains N full train steps (fwd 840^2 + dense/Pallas matching + MultiBox
loss + backward + Adam) inside one jitted fori_loop with the train state
as carry — the honest methodology for the async tunnel (see
utils/profiling.chained_benchmark). Sweeps batch size x remat to find
the best img/s/chip (VERDICT round-1 item: train-mode BN makes the
forward ~2x eval; the available levers are batch scaling + remat).

Usage: python scripts/bench_train_step.py [--model PRESET] [--size N]
           [bs,remat[,microbatches] ...]
  e.g. python scripts/bench_train_step.py 96,0 128,0 128,1 160,0,2
       python scripts/bench_train_step.py --model re50_eca_nonlocal 16,0 32,1
(microbatches > 1 = ghost-BN grad accumulation inside one step — the
round-3 workaround for the compile-service HTTP 500 at bs=160 one-shot.)
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs, losses, train
from jabd_tpu.ops import anchors as A


def bench_config(
    batch: int,
    remat: bool,
    microbatches: int = 1,
    size: int = 840,
    iters: int = 5,
    model: str = "jabd_flagship",
):
    mcfg = configs.get_model_config(model)
    tcfg = configs.TrainConfig(
        batch_size=batch, image_size=size, remat=remat,
        microbatches=microbatches,
    )
    state = train.create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, steps_per_epoch=100,
        image_size=size,
    )
    raw_step = train.make_train_step(mcfg, tcfg).__wrapped__
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (size, size)))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 50, (batch, size, size, 3)).astype(np.float32)
    )
    g = tcfg.max_targets
    nvalid = 12
    cxy = rng.uniform(0.2, 0.8, (batch, g, 2))
    wh = rng.uniform(0.02, 0.2, (batch, g, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    valid = np.zeros((batch, g), bool)
    valid[:, :nvalid] = True
    targets = losses.Targets(
        boxes=jnp.asarray(boxes.astype(np.float32)),
        labels=jnp.ones((batch, g), jnp.float32),
        landms=jnp.asarray(
            rng.uniform(0, 1, (batch, g, 10)).astype(np.float32)
        ),
        valid=jnp.asarray(valid),
    )

    # Inputs as ARGUMENTS, not closures: closed-over arrays are embedded
    # in the HLO as constants and the remote compile service rejects the
    # ~100MB upload (HTTP 413).
    @jax.jit
    def chained(state, images, targets, n):
        def body(_, carry):
            st, acc = carry
            st, metrics = raw_step(st, images, targets, anchors)
            return st, acc + metrics["loss"]

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    _, warm = chained(state, images, targets, 1)
    float(np.asarray(warm))
    t0 = time.perf_counter()
    _, acc = chained(state, images, targets, iters)
    float(np.asarray(acc))
    dt = time.perf_counter() - t0
    per = dt / iters
    return {
        "model": model,
        "batch": batch,
        "remat": remat,
        "microbatches": microbatches,
        "per_step_ms": round(per * 1e3, 1),
        "img_per_sec": round(batch / per, 1),
    }


def main():
    args = sys.argv[1:]
    model, size = "jabd_flagship", 840
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--model":
            model = args.pop(0)
        elif flag == "--size":
            size = int(args.pop(0))
        else:
            raise SystemExit(f"unknown flag {flag}")
    combos = [arg.split(",") for arg in args] or [
        ("96", "0"), ("128", "0"), ("128", "1"), ("192", "1"),
    ]
    for combo in combos:
        bs, rm = combo[0], combo[1]
        mb = int(combo[2]) if len(combo) > 2 else 1
        try:
            out = bench_config(
                int(bs), bool(int(rm)), mb, size=size, model=model
            )
        except Exception as e:  # OOM etc. — report and keep sweeping
            out = {"model": model, "batch": int(bs),
                   "remat": bool(int(rm)),
                   "microbatches": mb, "error": str(e)[:120]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
