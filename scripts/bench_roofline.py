"""HBM-roofline check for the flagship forward (round 4).

The per-layer dw probe (bench_dw_inference.py) showed each depthwise
layer moving ~600-750 GB/s of effective HBM traffic once the harness's
extra passes are counted — i.e. at the bandwidth roofline, not at a VPU
compute ceiling. This script closes the question for the WHOLE graph:
compare the compiled graph's own bytes-accessed estimate against the
measured wall time and the chip's peak bandwidth.

    roofline_ms = bytes_accessed / HBM_peak
    if measured_ms ~= roofline_ms, the graph runs at speed-of-light for
    its memory traffic and only traffic ELIMINATION (fusion) can help.

v5e HBM peak: 819 GB/s (public spec).

Usage: python scripts/bench_roofline.py [preset] [batch] [size]
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK_GBPS = 819.0
BF16_PEAK_TFLOPS = 197.0


def main(preset: str, batch: int, size: int, iters: int = 20) -> None:
    from jabd_tpu import configs
    from jabd_tpu.models import build_model
    from jabd_tpu.models.fold import fold_batchnorm
    from jabd_tpu.utils.profiling import chained_benchmark

    mcfg = configs.get_model_config(preset)
    model = build_model(mcfg, mode="eval")
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 50, (batch, size, size, 3)).astype(np.float32)
    )
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), images[:1]
    )
    folded = fold_batchnorm(model, variables, dtype=jnp.bfloat16)

    def fwd(imgs):
        outs = folded.apply(imgs.astype(jnp.bfloat16))
        return sum(jnp.sum(o).astype(jnp.float32) for o in outs)

    lowered = jax.jit(lambda im: folded.apply(im.astype(jnp.bfloat16))).lower(
        images
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    ms = chained_benchmark(fwd, (images,), iters=iters) * 1e3

    roofline_ms = bytes_accessed / (HBM_PEAK_GBPS * 1e9) * 1e3
    compute_ms = flops / (BF16_PEAK_TFLOPS * 1e12) * 1e3
    print(
        json.dumps(
            {
                "preset": preset,
                "batch": batch,
                "size": size,
                "measured_ms": round(ms, 2),
                "bytes_accessed_gb": round(bytes_accessed / 1e9, 2),
                "hbm_roofline_ms": round(roofline_ms, 2),
                "flops_tflop": round(flops / 1e12, 3),
                "compute_roofline_ms": round(compute_ms, 2),
                "pct_of_hbm_roofline": round(100 * roofline_ms / ms, 1),
                "achieved_gbps": round(
                    bytes_accessed / 1e9 / (ms / 1e3), 1
                ),
                "achieved_tflops": round(flops / 1e12 / (ms / 1e3), 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    preset = sys.argv[1] if len(sys.argv) > 1 else "jabd_flagship"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    main(preset, batch, size)
