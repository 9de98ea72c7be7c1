"""Measure (not estimate) the recognition train step on the real TPU.

Chains N full train steps (ir_50 fwd + AdaFace head over 70,722 classes
+ backward + SGD update, bs=256 @112^2) inside ONE jitted fori_loop with
the state as loop carry, so the ~700-leaf pytree is dispatched once and
the measurement is pure device time + one RTT — the same honest
methodology as the detection benchmarks (CLAUDE.md: through the axon
tunnel, block_until_ready returns before execution, and per-step
dispatch of a large state pytree costs seconds of pure host overhead).

Replaces BENCH_NOTES' "~90-120 ms estimated" with a measurement.
Reference recipe: train_val.py:52-70 + main.py hyperparams.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu.recognition import heads as H
from jabd_tpu.recognition import net as N
from jabd_tpu.recognition import train as RT


def main(batch=256, classes=70722, iters=10):
    model = N.build_model("ir_50", dtype=jnp.bfloat16)
    head = H.build_head("adaface", class_num=classes)
    state = RT.create_state(
        jax.random.PRNGKey(0), model, head, num_train_steps_hint=1000
    )
    step = RT.make_train_step(model, head)
    raw_step = step.__wrapped__  # un-jitted body; we jit the whole chain

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (batch, 112, 112, 3)).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(0, classes, batch).astype(np.int32))

    @jax.jit
    def chained(state, images, labels, n):
        def body(i, carry):
            st, acc = carry
            st, metrics = raw_step(
                st, images, labels, jax.random.fold_in(jax.random.PRNGKey(1), i)
            )
            return st, acc + metrics["loss"]

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    _, warm = chained(state, images, labels, 1)
    np.asarray(warm)  # compile + execute once
    t0 = time.perf_counter()
    _, acc = chained(state, images, labels, iters)
    acc = float(np.asarray(acc))
    dt = time.perf_counter() - t0
    per_step = dt / iters
    print(
        json.dumps(
            {
                "metric": "recognition_train_step_ir50_adaface",
                "batch": batch,
                "classes": classes,
                "per_step_ms": round(per_step * 1e3, 2),
                "img_per_sec": round(batch / per_step, 1),
                "loss_sum": round(acc, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
