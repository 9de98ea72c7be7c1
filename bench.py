"""Benchmark: flagship JABD end-to-end inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the fully-fused device program (normalize -> MobileNetV3-ECA
backbone -> NLM-FPN -> SSH -> heads -> decode -> top-k -> NMS) at 640x640,
batched, bf16 compute — the BASELINE.json north-star configuration.

vs_baseline: BASELINE.json publishes no reference number ("published": {});
the target is ">= 5x the 2080 Ti images/sec". The reference harness
(predict.py:253-333, bs=1 forward+decode+NMS) runs RetinaFace-MobileNet
class models at ~55 img/s on a 2080 Ti at this resolution (typical
published numbers for retinaface-pytorch forks; no first-party figure
exists). We therefore report vs_baseline = images_per_sec / (5 * 55.0),
i.e. 1.0 == the 5x-over-2080Ti target.
"""

from __future__ import annotations

import json
import sys

REFERENCE_2080TI_IMG_PER_SEC = 55.0
TARGET_MULTIPLIER = 5.0


def main(size: int = 640, batch: int = 0) -> None:
    """No-arg invocation (the driver's) measures the 640^2 north star;
    `python bench.py 1280 32` measures e.g. the reference predict.py
    eval configuration."""
    import functools

    from jabd_tpu.utils import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jabd_tpu import configs
    from jabd_tpu.models import build_model
    from jabd_tpu.ops import anchors as A
    from jabd_tpu.predict import detect_batch
    from jabd_tpu.utils.profiling import chained_benchmark

    batch = batch or (128 if jax.default_backend() == "tpu" else 2)
    mcfg = configs.get_model_config("jabd_flagship")
    pcfg = configs.PredictConfig(
        confidence=0.5,
        nms_iou=0.45,
        input_shape=(size, size),
        max_detections=512,
        pre_nms_topk=512,
    )
    model = build_model(mcfg, mode="eval")
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 50, (batch, size, size, 3)),
        dtype=jnp.float32,
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), images[:1]
    )
    # Random-init class heads pass ~half the anchors through the 0.5
    # confidence gate — a trained detector passes tens per image. Bias the
    # class heads toward background so the measured NMS workload matches
    # production score sparsity (the early-exit NMS loop depends on it).
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # unfreeze copy
    params = variables["params"]
    for i in range(1, mcfg.num_levels + 1):
        head = params[f"class_head{i}"]["conv1x1"]
        # scale 0.2 / bias +-2 yields ~170 candidates/image past the 0.5
        # gate on random inputs — a WIDER-like detection density.
        head["kernel"] = head["kernel"] * 0.2
        head["bias"] = jnp.tile(
            jnp.asarray([2.0, -2.0], head["bias"].dtype), 2
        )
    # Eval graph: fold BN into conv weights and pre-cast to bf16 (same
    # values the runtime cast would produce, half the HBM weight traffic).
    from jabd_tpu.models.fold import fold_batchnorm

    variables = fold_batchnorm(
        variables,
        cast=jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else None,
    )
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (size, size)))

    apply_fn = functools.partial(model.apply)
    use_pallas = jax.default_backend() == "tpu"

    def run(imgs):
        # __wrapped__: the chained harness jits the whole loop itself.
        return detect_batch.__wrapped__(
            apply_fn,
            variables,
            imgs,
            anchors,
            pcfg,
            variances=mcfg.anchors.variance,
            use_pallas=use_pallas,
        )

    stats = chained_benchmark(run, images, iters=20)
    ips = batch / stats["per_iter_s"]
    out = {
        "metric": f"images_per_sec_{size}_flagship_e2e",
        "value": round(ips, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(
            ips / (TARGET_MULTIPLIER * REFERENCE_2080TI_IMG_PER_SEC), 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main(*(int(a) for a in sys.argv[1:]))
    except Exception as e:  # never leave the driver without a JSON line
        print(
            json.dumps(
                {
                    "metric": "images_per_sec_640_flagship_e2e",
                    "value": 0.0,
                    "unit": "img/s/chip",
                    "vs_baseline": 0.0,
                    "error": str(e)[:200],
                }
            )
        )
        sys.exit(0)
