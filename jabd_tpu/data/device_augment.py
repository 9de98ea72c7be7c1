"""Training augmentation ON the TPU (MXU resample + fused HSV jitter).

Why: the reference runs `get_random_data` (utils/dataloader.py:71-149)
per-sample on CPU DataLoader workers — PIL bicubic resize onto a gray
canvas, flip, float-HSV jitter. Measured here, that Python/PIL/cv2 chain
tops out at ~2 img/s/core while one v5e chip trains at 450+ img/s: the
host pipeline, not the model, is the production wall.

TPU-first redesign: every pixel operation in the recipe is linear or
elementwise, so the whole augmentation is expressible as a per-sample
separable resample (two batched matmuls — MXU work) followed by a fused
elementwise HSV block (VPU work), inside the SAME jitted program as the
train step:

  * The host draws the random parameters (`wider.draw_augment_params`,
    shared with the byte-exact PIL path — identical RNG consumption), and
    builds two small dense resample matrices per sample,
    [S, bucket_h] and [S, bucket_w], that fold together PIL-semantics
    bicubic resize (antialiased taps, a=-0.5), the paste offset, and the
    horizontal flip. Box geometry reuses `wider.transform_boxes`, so
    TARGETS ARE BYTE-IDENTICAL to the host pipeline.
  * The device contracts  out = Mv @ image @ Mh^T  per sample (einsum
    over a uint8-decoded batch padded to a static bucket), adds the
    128-gray fill outside the paste region, and applies cv2-float-HSV
    jitter + mean subtraction as one fused elementwise chain.

Pixels differ from the PIL path only by resample rounding (PIL quantizes
to uint8 between its two passes and uses fixed-point taps); the
tolerance is asserted in tests/test_device_augment.py. Host cost drops
to decode + pad + O(S·K) matrix fill; H2D traffic *shrinks* (uint8
source + bf16 matrices < augmented float32 frames).

Reference: utils/dataloader.py:71-149 (recipe); PIL Resample.c
precompute_coeffs (tap semantics).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from jabd_tpu.data import wider
from jabd_tpu.ops.image import MEANS
from jabd_tpu.ops.resize import (
    TAPS_FSCAP,
    TAPS_K,
    expand_taps,
    paste_resize_matrix,
    paste_resize_taps,
    resample_canvas,
)

# Back-compat aliases (tap machinery lives in ops/resize.py, shared with
# the batched device letterbox).
from jabd_tpu.ops.resize import pil_bicubic_taps as _pil_taps  # noqa: F401

_axis_matrix = paste_resize_matrix


class AugmentPlan(NamedTuple):
    """Per-batch device-augmentation program (all host-built numpy/jnp).

    mv:       [B, S, bucket_h] vertical resample+paste matrices
    mh:       [B, S, bucket_w] horizontal (flip folded in)
    inside_v: [B, S] 1.0 where the paste covers the canvas row
    inside_h: [B, S] 1.0 where the paste covers the canvas column
    hsv:      [B, 3] (dh*360, ds, dv) jitter parameters
    """

    mv: np.ndarray
    mh: np.ndarray
    inside_v: np.ndarray
    inside_h: np.ndarray
    hsv: np.ndarray


class AugmentPlanTaps(NamedTuple):
    """Compact (taps-form) device-augmentation program.

    Equivalent to AugmentPlan but ships per-row tap windows instead of
    dense [S, bucket] matrices: ~bucket/TAPS_K (=32x at bucket 1024)
    fewer plan bytes over the wire. The dense matrices dominated
    device-augment H2D through the remote-TPU tunnel (252 of ~550
    MB/batch at bs=96/bucket 1024² — measured as an input-pipeline wall
    in the round-3 at-scale run); the device rebuilds them with
    ops/resize.expand_taps and runs the same MXU einsums.

    xmin_v/h: [B, S] int32 first-tap index per canvas row/col
    w_v/h:    [B, S, TAPS_K] tap weights (flip folded in h)
    inside_v/h, hsv: as AugmentPlan
    """

    xmin_v: np.ndarray
    w_v: np.ndarray
    xmin_h: np.ndarray
    w_h: np.ndarray
    inside_v: np.ndarray
    inside_h: np.ndarray
    hsv: np.ndarray


def plan_sample(
    image_u8: np.ndarray,  # [ih, iw, 3] uint8 (decoded, unpadded)
    box: np.ndarray,  # [N, 15]
    input_size: int,
    rng: np.random.Generator,
    bucket_hw: Tuple[int, int],
    jitter: float = 0.3,
    hue: float = 0.1,
    sat: float = 1.5,
    val: float = 1.5,
    compact: bool = False,
):
    """Draw one augmentation and compile it to device matrices.

    Returns (padded_u8 [bh, bw, 3], plan parts, boxes [M, 15]). Boxes
    are byte-identical to `wider.augment_sample` under the same rng.
    Oversize sources are PIL-bicubic pre-shrunk to the bucket, and any
    axis whose downscale factor exceeds TAPS_FSCAP is pre-shrunk to the
    cap (composes with the matrix resample; pixel-only effect) — this
    bounds every tap window to TAPS_K, so the compact plan shape is
    static.

    compact=False: parts are (mv, mh, inside_v, inside_h, hsv) dense
    matrices. compact=True: (xmin_v, w_v, xmin_h, w_h, inside_v,
    inside_h, hsv) taps form (production default — ~32x fewer plan
    bytes to ship).
    """
    ih, iw = image_u8.shape[:2]
    draw = wider.draw_augment_params(rng, input_size, jitter, hue, sat, val)
    boxes = wider.transform_boxes(box, draw, (iw, ih), input_size, rng)

    bh, bw = bucket_hw
    # Cap per-axis size: the bucket AND the tap-window bound
    # (TAPS_FSCAP x the effective output span per axis).
    th = min(ih, bh, int(TAPS_FSCAP * max(draw.nh, 1)))
    tw = min(iw, bw, int(TAPS_FSCAP * max(draw.nw, 1)))
    if (th, tw) != (ih, iw):
        from PIL import Image

        image_u8 = np.asarray(
            Image.fromarray(image_u8).resize((tw, th), Image.BICUBIC)
        )
        ih, iw = th, tw
    # Padding content is never read with nonzero weight (all tap indices
    # stay inside the source), so skip zero-filling the margins.
    padded = np.empty((bh, bw, 3), np.uint8)
    padded[:ih, :iw] = image_u8

    s = input_size
    hsv = np.asarray([draw.dh * 360.0, draw.ds, draw.dv], np.float32)
    if compact:
        xv, wv, inside_v = paste_resize_taps(ih, draw.nh, draw.dy, s)
        xh, wh, inside_h = paste_resize_taps(
            iw, draw.nw, draw.dx, s, flip=draw.flip
        )
        return padded, (xv, wv, xh, wh, inside_v, inside_h, hsv), boxes
    mv, inside_v = _axis_matrix(ih, draw.nh, draw.dy, s, bh, flip=False)
    mh, inside_h = _axis_matrix(iw, draw.nw, draw.dx, s, bw, flip=draw.flip)
    return padded, (mv, mh, inside_v, inside_h, hsv), boxes


def stack_plans(
    parts: Sequence[Tuple], matrix_dtype=None
):
    """Stack per-sample plan tuples into one AugmentPlan (5-tuples,
    dense) or AugmentPlanTaps (7-tuples, compact) batch.

    matrix_dtype: storage dtype for the resample matrices/weights. The
    device casts them to its resample dtype anyway, so the production
    loader ships bfloat16 (halves the plan H2D bytes with zero effect on
    the bf16 compute path); parity tests keep float32."""
    mdt = matrix_dtype or np.float32
    if len(parts[0]) == 7:
        xv, wv, xh, wh, iv, ih_, hsv = zip(*parts)
        return AugmentPlanTaps(
            xmin_v=np.ascontiguousarray(np.stack(xv)),
            w_v=np.ascontiguousarray(np.stack(wv)).astype(mdt),
            xmin_h=np.ascontiguousarray(np.stack(xh)),
            w_h=np.ascontiguousarray(np.stack(wh)).astype(mdt),
            inside_v=np.ascontiguousarray(np.stack(iv)),
            inside_h=np.ascontiguousarray(np.stack(ih_)),
            hsv=np.stack(hsv),
        )
    mv, mh, iv, ih_, hsv = zip(*parts)
    return AugmentPlan(
        mv=np.stack(mv).astype(mdt),
        mh=np.stack(mh).astype(mdt),
        inside_v=np.stack(iv),
        inside_h=np.stack(ih_),
        hsv=np.stack(hsv),
    )


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------


def rgb_to_hsv_cv2(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2 COLOR_RGB2HSV float semantics: rgb in [0,1] ->
    (H in [0,360], S, V in [0,1]). Matches OpenCV's RGB2HSV_f
    (FLT_EPSILON-guarded divisions, channel-priority tie-breaks)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - vmin
    eps = jnp.float32(np.finfo(np.float32).eps)
    s = diff / (jnp.abs(v) + eps)
    k = 60.0 / (diff + eps)
    h = jnp.where(
        v == r,
        (g - b) * k,
        jnp.where(v == g, (b - r) * k + 120.0, (r - g) * k + 240.0),
    )
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_cv2(hsv: jnp.ndarray) -> jnp.ndarray:
    """cv2 COLOR_HSV2RGB float semantics: (H [0,360], S, V [0,1]) -> rgb
    in [0,1] (OpenCV HSV2RGB_f sector table)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = h / 60.0
    sector = jnp.floor(h)
    f = h - sector
    sector = jnp.mod(sector.astype(jnp.int32), 6)
    tab0 = v
    tab1 = v * (1.0 - s)
    tab2 = v * (1.0 - s * f)
    tab3 = v * (1.0 - s * (1.0 - f))
    # OpenCV sector_data (RGB order): per sector the (r, g, b) tab picks.
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [tab0, tab2, tab1, tab1, tab3],
        tab0,
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [tab3, tab0, tab0, tab2, tab1],
        tab1,
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [tab1, tab1, tab3, tab0, tab0],
        tab2,
    )
    return jnp.stack([r, g, b], axis=-1)


def device_augment(
    images_u8: jnp.ndarray,  # [B, bucket_h, bucket_w, 3] uint8
    plan,  # AugmentPlan | AugmentPlanTaps
    resample_dtype: jnp.dtype = jnp.bfloat16,
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Jit-able: padded uint8 sources + plan -> mean-subtracted float
    [B, S, S, 3] training frames (the exact tensor `augment_sample` +
    `preprocess_input_np` produce, up to resample rounding).

    resample_dtype=bfloat16 puts the two contractions on the MXU at full
    rate (uint8 pixel values are exact in bf16; tap weights round to ~3
    decimal digits — ≤1 LSB output effect). float32 selects HIGHEST
    precision for parity testing.

    Taps-form plans (the production loader default) are expanded to the
    dense matrices on device first (ops/resize.expand_taps) — same
    compute path, ~32x fewer H2D plan bytes.
    """
    if isinstance(plan, AugmentPlanTaps):
        bh, bw = images_u8.shape[1], images_u8.shape[2]
        mv = expand_taps(plan.xmin_v, plan.w_v, bh, resample_dtype)
        mh = expand_taps(plan.xmin_h, plan.w_h, bw, resample_dtype)
    else:
        mv, mh = plan.mv, plan.mh
    y = resample_canvas(
        images_u8,
        mv,
        mh,
        plan.inside_v,
        plan.inside_h,
        fill=128.0,
        resample_dtype=resample_dtype,
    )

    # HSV jitter — the reference's exact op order incl. its H>1 quirk
    # (utils/dataloader.py:105-113, kept verbatim in wider.augment_sample).
    hsv = rgb_to_hsv_cv2(y / 255.0)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    dh = plan.hsv[:, 0][:, None, None]
    ds = plan.hsv[:, 1][:, None, None]
    dv = plan.hsv[:, 2][:, None, None]
    h = h + dh
    h = jnp.where(h > 1.0, h - 1.0, h)
    h = jnp.where(h < 0.0, h + 1.0, h)
    s = s * ds
    v = v * dv
    h = jnp.minimum(h, 360.0)
    s = jnp.minimum(s, 1.0)
    v = jnp.minimum(v, 1.0)
    h = jnp.maximum(h, 0.0)
    s = jnp.maximum(s, 0.0)
    v = jnp.maximum(v, 0.0)
    rgb = hsv_to_rgb_cv2(jnp.stack([h, s, v], axis=-1)) * 255.0

    out = rgb - jnp.asarray(MEANS, jnp.float32)
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Loader
# ---------------------------------------------------------------------------


def device_train_loader(
    dataset: "wider.WiderFaceDataset",
    batch_size: int,
    bucket_hw: Tuple[int, int] = (1024, 1024),
    max_targets: int = 128,
    seed: int = 0,
    num_workers: int = 8,
    drop_last: bool = True,
    compact: bool = True,
):
    """Device-augmentation twin of `wider.train_loader`: yields
    (images_u8 [B,bh,bw,3], AugmentPlanTaps (compact=True, default) or
    AugmentPlan, padded targets). Host pixel work is decode + pad only;
    empty-box backfill re-draws PLANS (no pixel cost) and duplicates
    samples exactly like the host loader."""
    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(max_workers=num_workers)

    def load_raw(idx):
        # cv2 (libjpeg-turbo) decodes ~2x faster than PIL — and decode
        # is the dominant host cost in device-augment mode. The
        # byte-exact host pipeline (WiderFaceDataset.get) keeps PIL;
        # decoder rounding (<=1 LSB on rare pixels) is irrelevant to
        # augmentation input.
        import cv2

        bgr = cv2.imread(dataset.imgs_path[int(idx)], cv2.IMREAD_COLOR)
        if bgr is None:  # non-JPEG/odd file: PIL fallback
            from PIL import Image

            img = Image.open(dataset.imgs_path[int(idx)]).convert("RGB")
            return np.asarray(img, np.uint8)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)

    def make(idx, raw, attempt=0):
        # wider.sample_rng: the SAME per-(sample, attempt) stream as the
        # host loader — targets must stay byte-identical across loaders.
        return plan_sample(
            raw, dataset.annos[int(idx)], dataset.input_size,
            wider.sample_rng(seed, idx, attempt), bucket_hw,
            compact=compact,
        )

    try:
        for idxs in wider.epoch_batches(
            len(dataset), batch_size, seed, drop_last
        ):
            raws = dict(
                zip(map(int, idxs), pool.map(load_raw, idxs))
            )
            results = wider.backfill_batch(
                idxs,
                [make(idx, raws[int(idx)]) for idx in idxs],
                lambda idx, attempt: make(idx, raws[int(idx)], attempt),
                lambda r: len(r[2]) == 0,
                batch_size,
            )
            if not results:
                continue
            images = np.stack([r[0] for r in results])
            plan = stack_plans(
                [r[1] for r in results],
                matrix_dtype=ml_dtypes.bfloat16,
            )
            tgts = wider.batch_targets(
                [r[2] for r in results], max_targets
            )
            yield images, plan, tgts
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
