"""Image front-end: letterbox + normalization.

Reference: utils/utils.py:8-30 — `letterbox_image` (aspect-preserving cv2
resize pasted onto a gray canvas; NOTE the nonstandard fill value 84, not
128 — utils/utils.py:17) and `preprocess_input` (subtract channel means
(104, 117, 123)).

Two implementations:
  * host (numpy/cv2): byte-exact with the reference, used when parity with
    the PyTorch pipeline matters;
  * device (jnp): the same math expressed with the matmul resize so that
    preprocess -> backbone -> decode -> NMS fuses into ONE device program
    (BASELINE north star). cv2's INTER_LINEAR equals bilinear with
    half-pixel centers (align_corners=False).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu.ops import resize as R

MEANS = (104.0, 117.0, 123.0)
LETTERBOX_FILL = 84.0  # utils/utils.py:17 (not 128!)


def preprocess_input_np(image: np.ndarray) -> np.ndarray:
    """Subtract channel means in place-free numpy (utils/utils.py:28-30)."""
    return image - np.asarray(MEANS, dtype=np.float32)


def serving_front_end(
    image: np.ndarray, size_wh: Tuple[int, int], letterbox: bool = True
) -> np.ndarray:
    """THE serving preprocessing: letterbox (or plain resize) in the
    image's ORIGINAL dtype, THEN float + mean subtraction. cv2 resize of
    uint8 rounds, and the reference converts to float only after the
    resize (predict.py:144 -> utils/utils.py:15), so byte-parity
    requires this exact order. One definition shared by
    Predictor.detect_image, the AOT detector, and the serving daemon —
    three hand-synced copies of this block had to agree byte-for-byte
    before this helper existed."""
    if letterbox:
        x = letterbox_np(image, size_wh)
    else:
        import cv2

        x = cv2.resize(image, size_wh).astype(np.float32)
    return preprocess_input_np(x.astype(np.float32))


def letterbox_np(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Host letterbox, byte-compatible with utils/utils.py:8-19.

    image: [H, W, 3] uint8/float; size: (w, h) like the reference.
    """
    import cv2

    ih, iw = image.shape[:2]
    w, h = size
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    resized = cv2.resize(image, (nw, nh))
    canvas = np.full((h, w, 3), LETTERBOX_FILL, dtype=np.float32)
    top = (h - nh) // 2
    left = (w - nw) // 2
    canvas[top : top + nh, left : left + nw] = resized
    return canvas


def letterbox_params(
    image_hw: Tuple[int, int], target_hw: Tuple[int, int]
) -> Tuple[float, int, int, int, int]:
    """(scale, new_h, new_w, top, left) of the letterbox placement."""
    ih, iw = image_hw
    th, tw = target_hw
    scale = min(tw / iw, th / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    return scale, nh, nw, (th - nh) // 2, (tw - nw) // 2


def letterbox_device(
    image: jnp.ndarray, target_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Jit-able letterbox of a single [H, W, 3] image to (H', W').

    Static shapes in, static shapes out: the resize matrices are trace-time
    constants per (in, out) pair.
    """
    ih, iw = image.shape[:2]
    th, tw = target_hw
    _, nh, nw, top, left = letterbox_params((ih, iw), (th, tw))
    x = R.resize(
        image[None].astype(jnp.float32),
        (nh, nw),
        mode="bilinear",
        align_corners=False,
    )[0]
    canvas = jnp.full((th, tw, 3), LETTERBOX_FILL, dtype=jnp.float32)
    return canvas.at[top : top + nh, left : left + nw].set(x)


def preprocess_device(images: jnp.ndarray) -> jnp.ndarray:
    """Subtract channel means on device ([..., 3] layout)."""
    return images - jnp.asarray(MEANS, dtype=images.dtype)


def plan_letterbox(
    image_u8: np.ndarray,  # [ih, iw, 3] uint8
    target_hw: Tuple[int, int],
    bucket_hw: Tuple[int, int],
    letterbox: bool = True,
):
    """Compile ONE image's letterbox into per-sample resample matrices
    (cv2 INTER_LINEAR semantics, centered paste, fill 84) against a
    static uint8 source bucket.

    With these, a single jitted graph letterboxes a batch of
    ARBITRARY-SIZED images — the serving answer to the reference's
    per-image host cv2 loop (predict.py:144): no recompile per source
    size, preprocessing fused with the model. Oversize sources are
    cv2-bilinear pre-shrunk to the bucket (composes; pixel-only effect).

    Returns (padded_u8 [bh, bw, 3], (mv, mh, inside_v, inside_h)).
    """
    from jabd_tpu.ops.resize import cv2_bilinear_taps, paste_resize_matrix

    ih, iw = image_u8.shape[:2]
    th, tw = target_hw
    bh, bw = bucket_hw
    if ih > bh or iw > bw:
        import cv2

        s = min(bh / ih, bw / iw)
        image_u8 = cv2.resize(
            image_u8, (max(int(iw * s), 1), max(int(ih * s), 1))
        )
        ih, iw = image_u8.shape[:2]
    if letterbox:
        _, nh, nw, top, left = letterbox_params((ih, iw), (th, tw))
    else:
        # PredictConfig.letterbox=False: plain aspect-breaking cv2
        # resize to the target (predict.py's else-branch).
        nh, nw, top, left = th, tw, 0, 0
    padded = np.empty((bh, bw, 3), np.uint8)
    padded[:ih, :iw] = image_u8

    mv, inside_v = paste_resize_matrix(
        ih, nh, top, th, bh, taps=cv2_bilinear_taps
    )
    mh, inside_h = paste_resize_matrix(
        iw, nw, left, tw, bw, taps=cv2_bilinear_taps
    )
    return padded, (mv, mh, inside_v, inside_h)


def letterbox_batch_device(
    images_u8: jnp.ndarray,  # [B, bh, bw, 3] uint8 (bucketed sources)
    mv: jnp.ndarray,  # [B, th, bh]
    mh: jnp.ndarray,  # [B, tw, bw]
    inside_v: jnp.ndarray,  # [B, th]
    inside_h: jnp.ndarray,  # [B, tw]
    resample_dtype=None,
) -> jnp.ndarray:
    """Jit-able: bucketed uint8 sources + plans -> mean-subtracted
    float32 [B, th, tw, 3] frames ready for the detector (the tensor
    letterbox_np + preprocess_input_np produce, up to cv2's uint8
    fixed-point rounding — <=1 grey level)."""
    y = R.resample_canvas(
        images_u8,
        mv,
        mh,
        inside_v,
        inside_h,
        fill=LETTERBOX_FILL,
        resample_dtype=resample_dtype or jnp.bfloat16,
    )
    return y - jnp.asarray(MEANS, jnp.float32)


# Composite cubic-prescale + bilinear-letterbox windows span at most
# 4 + ceil(1/scale) source taps; 16 covers pyramid scales down to ~0.09.
PYRAMID_TAPS_K = 16


def pad_to_bucket(
    image_u8: np.ndarray, bucket_hw: Tuple[int, int]
) -> np.ndarray:
    """Place a [H, W, 3] uint8 image into a static source bucket (tail
    garbage never contributes — plan weights are zero past H/W)."""
    bh, bw = bucket_hw
    padded = np.empty((bh, bw, 3), np.uint8)
    ih, iw = image_u8.shape[:2]
    padded[:ih, :iw] = image_u8
    return padded


def plan_pyramid(
    image_hw: Tuple[int, int],
    scale: float,
    target_hw: Tuple[int, int],
    letterbox: bool = True,
    k_max: int = PYRAMID_TAPS_K,
):
    """Compile ONE (image, pyramid-scale) pair's scale-then-letterbox —
    the detect_multiscale recipe: float32 cv2 INTER_CUBIC pre-scale
    (predict.py:413-417) followed by the cv2 INTER_LINEAR letterbox onto
    the 84-gray canvas (utils/utils.py:8-19) — into ONE taps-form
    resample plan over the RAW uint8 source.

    Every scale of the pyramid rides the same source upload: the batched
    WIDER pyramid ships one bucketed u8 image + ~KB-scale plans instead
    of len(scales) preprocessed float32 frames (~5-8x fewer H2D bytes),
    and the 75 ms/img host pre-scale (BENCH_NOTES round 3) moves onto
    the MXU. Composition is exact up to f32 association (both stages are
    linear; the host recipe materializes the float32 intermediate, we
    don't).

    Returns ((xv, wv, inside_v, xh, wh, inside_h), (sh, sw)) where
    (sh, sw) is the virtual pre-scaled size (the caller needs it for the
    box undo, run_wider.py).
    """
    ih, iw = image_hw
    th, tw = target_hw
    sw = max(int(iw * scale), 32)
    sh = max(int(ih * scale), 32)
    if letterbox:
        _, nh, nw, top, left = letterbox_params((sh, sw), (th, tw))
    else:
        nh, nw, top, left = th, tw, 0, 0
    xv, wv, iv = R.compose_scale_letterbox_taps(ih, sh, nh, top, th, k_max)
    xh, wh, ihm = R.compose_scale_letterbox_taps(iw, sw, nw, left, tw, k_max)
    return (xv, wv, iv, xh, wh, ihm), (sh, sw)


def pyramid_batch_device(
    images_u8: jnp.ndarray,  # [B, bh, bw, 3] uint8 (bucketed sources)
    xv: jnp.ndarray,  # [B, th] int32
    wv: jnp.ndarray,  # [B, th, K]
    inside_v: jnp.ndarray,  # [B, th]
    xh: jnp.ndarray,  # [B, tw] int32
    wh: jnp.ndarray,  # [B, tw, K]
    inside_h: jnp.ndarray,  # [B, tw]
) -> jnp.ndarray:
    """Jit-able: bucketed uint8 sources + composite pyramid plans ->
    mean-subtracted float32 [B, th, tw, 3] frames. Unlike
    letterbox_batch_device this path is all-float32 with NO intermediate
    clamp/round — the host recipe it replaces runs cv2 on float32
    throughout (cubic overshoot outside [0, 255] is legitimate there)."""
    bh = images_u8.shape[1]
    bw = images_u8.shape[2]
    mv = R.expand_taps(xv, wv, bh, jnp.float32)
    mh = R.expand_taps(xh, wh, bw, jnp.float32)
    x = images_u8.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("brh,bhwc->brwc", mv, x, precision=hi)
    y = jnp.einsum("bow,brwc->broc", mh, y, precision=hi)
    inside = (
        inside_v.astype(jnp.float32)[:, :, None]
        * inside_h.astype(jnp.float32)[:, None, :]
    )[..., None]
    y = y * inside + LETTERBOX_FILL * (1.0 - inside)
    return y - jnp.asarray(MEANS, jnp.float32)


def correct_boxes_scale_offset(
    input_hw: Tuple[int, int], image_hw: Tuple[int, int]
):
    """Letterbox-undo terms of utils/utils_bbox.py:9-24
    (retinaface_correct_boxes). Returns (offset_xy, scale_xy) to apply to
    normalized coords as (v - offset) * scale."""
    input_shape = np.asarray(input_hw, dtype=np.float64)
    image_shape = np.asarray(image_hw, dtype=np.float64)
    new_shape = image_shape * float(np.min(input_shape / image_shape))
    offset = (input_shape - new_shape) / 2.0 / input_shape  # (y, x)
    scale = input_shape / new_shape  # (y, x)
    return (offset[1], offset[0]), (scale[1], scale[0])
