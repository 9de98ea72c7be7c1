"""Int8 vs bf16 serving throughput (models/quantize.py), real TPU.

Measures the FORWARD (model-only) chained throughput of an MXU-bound
preset in bf16 and int8 at the same shapes — the int8 MXU on v5e runs
2x bf16 peak, and int8 halves weight+activation conv bytes. The
depthwise-bound flagship is included as the expected-negative control
(its convs stay bf16 except the pointwise ones; VPU work dominates).

    python scripts/bench_int8.py [preset] [size] [batch]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(preset="re50_baseline", size=640, batch=64):
    from jabd_tpu.utils import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jabd_tpu.models import quantize as Q
    from jabd_tpu.utils.profiling import chained_benchmark

    rng = np.random.default_rng(0)
    if preset.startswith("ir"):
        from jabd_tpu.recognition import build_model as build_ir
        from jabd_tpu.recognition.fold import fold_ir

        model = build_ir(preset, dtype=jnp.bfloat16)
        images = jnp.asarray(
            rng.normal(0, 1, (batch, size, size, 3)), jnp.float32
        )
        variables = jax.jit(functools.partial(model.init, train=False))(
            jax.random.PRNGKey(0), images[:1]
        )
        folded = fold_ir(variables, cast=jnp.bfloat16)
    else:
        from jabd_tpu import configs
        from jabd_tpu.models import build_model
        from jabd_tpu.models.fold import fold_batchnorm

        mcfg = configs.get_model_config(preset)
        model = build_model(mcfg, mode="eval")
        images = jnp.asarray(
            rng.normal(0, 50, (batch, size, size, 3)), jnp.float32
        )
        variables = jax.jit(functools.partial(model.init, train=False))(
            jax.random.PRNGKey(0), images[:1]
        )
        folded = fold_batchnorm(
            variables,
            cast=(
                jnp.bfloat16
                if mcfg.compute_dtype == "bfloat16"
                else None
            ),
        )

    def fwd(v):
        def run(imgs):
            return model.apply(v, imgs, train=False)

        return run

    stats = chained_benchmark(fwd(folded), images, iters=10)
    bf16_ms = stats["per_iter_s"] * 1e3
    print(
        json.dumps(
            {
                "preset": preset, "size": size, "batch": batch,
                "bf16_ms": round(bf16_ms, 1),
                "bf16_img_s": round(batch / stats["per_iter_s"], 1),
            }
        ),
        flush=True,
    )

    calib = Q.calibrate(model, folded, [images[:8]])
    qvars, n = Q.quantize_variables(folded, calib)
    stats = chained_benchmark(fwd(qvars), images, iters=10)
    int8_ms = stats["per_iter_s"] * 1e3
    print(
        json.dumps(
            {
                "preset": preset, "quantized_sites": n,
                "int8_ms": round(int8_ms, 1),
                "int8_img_s": round(batch / stats["per_iter_s"], 1),
                "speedup": round(bf16_ms / int8_ms, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        args[0] if args else "re50_baseline",
        int(args[1]) if len(args) > 1 else 640,
        int(args[2]) if len(args) > 2 else 64,
    )
