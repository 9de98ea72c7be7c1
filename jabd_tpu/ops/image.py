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

import jax.numpy as jnp
import numpy as np

from jabd_tpu.ops import resize as R

MEANS = (104.0, 117.0, 123.0)
LETTERBOX_FILL = 84.0  # utils/utils.py:17 (not 128!)


def preprocess_input_np(image: np.ndarray) -> np.ndarray:
    """Subtract channel means in place-free numpy (utils/utils.py:28-30)."""
    return image - np.asarray(MEANS, dtype=np.float32)


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
