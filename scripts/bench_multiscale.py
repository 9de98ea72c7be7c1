"""Measure the multiscale image-pyramid eval (BASELINE tracked config #5).

The batched pyramid (eval/run_wider.py multiscale branch) makes
len(scales) fused-graph dispatches per chunk — every scale letterboxes
to the same static input, so the device cost is exactly
len(scales) x the single-scale batched cost. This script measures:

  1. the per-scale device cost with chained_benchmark (honest under the
     tunnel's early block_until_ready),
  2. the host pyramid pre-scale cost per image (float32 bicubic x
     scales + letterbox + preprocess, the run_wider load_ms recipe),
  3. the host merge + numpy-NMS cost per image at a realistic
     candidate density,
  4. the DEVICE-pyramid path (run_wider pyramid="device"): host
     plan-building cost (ops/image.py::plan_pyramid, replaces the
     host pre-scale) and the fused resample+detect per-scale device
     cost from the raw uint8 source,

and prints one JSON line with the device-bound multiscale rate plus the
host rates so the sustained min() is readable. Reference analog: the
pyramid trick the WIDER hard-set leaders use; the reference repo itself
evaluates single-scale (predict.py:338-415).

Usage: python scripts/bench_multiscale.py [size batch n_scales]
       (defaults 1280 32 3 — the reference eval shape)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from jabd_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.models.fold import fold_batchnorm
from jabd_tpu.ops import anchors as A
from jabd_tpu.ops import image as I
from jabd_tpu.ops.nms import nms_numpy
from jabd_tpu.predict import detect_batch
from jabd_tpu.utils.profiling import chained_benchmark

SCALES = (0.75, 1.0, 1.25)


def main(size: int = 1280, batch: int = 32, n_scales: int = 3) -> None:
    scales = SCALES[:n_scales]
    mcfg = configs.get_model_config("jabd_flagship")
    pcfg = configs.PredictConfig(
        confidence=0.5, nms_iou=0.45, input_shape=(size, size),
        max_detections=512, pre_nms_topk=512,
    )
    model = build_model(mcfg, mode="eval")
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 50, (batch, size, size, 3)),
        dtype=jnp.float32,
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), images[:1]
    )
    params = variables["params"]
    for i in range(1, mcfg.num_levels + 1):  # production score sparsity
        head = params[f"class_head{i}"]["conv1x1"]
        head["kernel"] = head["kernel"] * 0.2
        head["bias"] = jnp.tile(
            jnp.asarray([2.0, -2.0], head["bias"].dtype), 2
        )
    variables = fold_batchnorm(variables, cast=jnp.bfloat16)
    anchors = jnp.asarray(A.generate_anchors(mcfg.anchors, (size, size)))
    use_pallas = jax.default_backend() == "tpu"

    def run(imgs):
        return detect_batch.__wrapped__(
            model.apply, variables, imgs, anchors, pcfg,
            variances=mcfg.anchors.variance, use_pallas=use_pallas,
        )

    stats = chained_benchmark(run, images, iters=12)
    per_scale_ms = stats["per_iter_s"] * 1e3
    dev_ms_img = per_scale_ms * len(scales) / batch

    # Host pyramid pre-scale (the run_wider load_ms recipe) on a
    # WIDER-typical source frame.
    import cv2

    src = np.random.default_rng(1).integers(
        0, 255, (768, 1024, 3), dtype=np.uint8
    )
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        for s in scales:
            sw = max(int(src.shape[1] * s), 32)
            sh = max(int(src.shape[0] * s), 32)
            scaled = cv2.resize(
                src.astype(np.float32), (sw, sh),
                interpolation=cv2.INTER_CUBIC,
            )
            I.preprocess_input_np(I.letterbox_np(scaled, (size, size)))
    host_prescale_ms = (time.perf_counter() - t0) / reps * 1e3

    # Device-pyramid path: plan building on host + fused
    # resample+detect from the raw uint8 source on device.
    reps_plan = 20
    t0 = time.perf_counter()
    for _ in range(reps_plan):
        plans = [
            I.plan_pyramid(src.shape[:2], s, (size, size)) for s in scales
        ]
    host_plan_ms = (time.perf_counter() - t0) / reps_plan * 1e3

    bh = -(-src.shape[0] // 128) * 128
    bw = -(-src.shape[1] // 128) * 128
    src_b = jnp.asarray(
        np.broadcast_to(
            I.pad_to_bucket(src, (bh, bw))[None], (batch, bh, bw, 3)
        ).copy()
    )
    plan_b = [
        jnp.asarray(np.broadcast_to(p[None], (batch, *p.shape)).copy())
        for p in plans[0][0]
    ]

    def run_pyramid(inp):
        # Plans arrive through the loop carry (not a closure): closed-over
        # plans embed as constants, expand_taps becomes loop-invariant,
        # and XLA hoists the dense-matrix expansion out of the timed loop
        # — overstating the rate vs the real run_wider path where plans
        # are fresh arguments every dispatch (CLAUDE.md hoisting trap).
        srcs, plans = inp
        frames = I.pyramid_batch_device(srcs, *plans)
        return detect_batch.__wrapped__(
            model.apply, variables, frames, anchors, pcfg,
            variances=mcfg.anchors.variance, use_pallas=use_pallas,
        )

    pyr_stats = chained_benchmark(
        run_pyramid, (src_b, tuple(plan_b)), iters=12
    )
    pyr_scale_ms = pyr_stats["per_iter_s"] * 1e3
    pyr_ms_img = pyr_scale_ms * len(scales) / batch

    # Host merge + NMS at a realistic merged density (3 x ~170 cands).
    rng = np.random.default_rng(2)
    m = rng.random((510, 5)).astype(np.float32)
    m[:, 2:4] = m[:, :2] + 0.05 + m[:, 2:4] * 0.1
    t0 = time.perf_counter()
    for _ in range(100):
        nms_numpy(m[:, :4], m[:, 4], iou_threshold=pcfg.nms_iou)
    host_nms_ms = (time.perf_counter() - t0) / 100 * 1e3

    print(json.dumps({
        "metric": f"multiscale_pyramid_{size}_x{len(scales)}",
        "per_scale_batch_ms": round(per_scale_ms, 1),
        "device_img_per_sec_multiscale": round(1e3 / dev_ms_img, 1),
        "host_prescale_ms_per_img": round(host_prescale_ms, 1),
        "host_merge_nms_ms_per_img": round(host_nms_ms, 2),
        "device_pyramid_per_scale_batch_ms": round(pyr_scale_ms, 1),
        "device_pyramid_img_per_sec": round(1e3 / pyr_ms_img, 1),
        "host_plan_ms_per_img": round(host_plan_ms, 2),
        "batch": batch,
        "scales": list(scales),
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
