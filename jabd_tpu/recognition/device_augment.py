"""Recognition training augmentation ON the TPU (ROADMAP round-2 #7).

The reference's AdaFace augmentation (data.py:217-260 — zero-padded
random resized crop, cv2 down-up low-res resampling, photometric
jitter, flip, [-1,1] normalize) runs per-sample on CPU workers. Every
op in the recipe is linear or elementwise:

  * crop-zeroing is a rank-1 mask (outer product of row/col interval
    indicators);
  * the low-res down-up resample composes into ONE [112, 112] linear
    map per axis — built on the host by resizing an identity matrix
    with cv2 itself (so every cv2 interpolation mode's exact float
    semantics, NEAREST/LINEAR/AREA/CUBIC/LANCZOS4, is captured without
    reimplementing its taps), with the flip folded in;
  * photometric jitter + normalize are elementwise with per-sample
    scalars (identity at b=c=s=1, so no flags are shipped).

The device applies mask -> per-sample Mv @ x @ Mh^T (batched MXU
einsums, shared machinery with the detection path's
`ops/resize.resample_canvas` pattern) -> fused photometric/normalize,
inside the same jitted program as the train step. Pixels match the host
path exactly when no low-res draw fires; low-res cases differ only by
cv2's intermediate uint8 quantization (the composed float matrix skips
it), asserted in tests/test_recognition_device_augment.py.

Reference: data.py:217-260 (recipe), data.py:322-333 (low-res).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from jabd_tpu.recognition import data as D


class FaceAugmentPlan(NamedTuple):
    """Per-batch device face-augmentation program (host-built).

    mv, mh:   [B, S, S] per-sample resample matrices (flip folded in mh)
    keep_v:   [B, S] 1.0 on rows kept by the crop (all-ones: no crop)
    keep_h:   [B, S] columns kept by the crop
    photo:    [B, 3] (brightness, contrast, saturation); (1,1,1) = off
    photo_order: [B, 3] int32 ColorJitter op order (0=b, 1=c, 2=s)
    """

    mv: np.ndarray
    mh: np.ndarray
    keep_v: np.ndarray
    keep_h: np.ndarray
    photo: np.ndarray
    photo_order: np.ndarray


@functools.lru_cache(maxsize=1024)
def cv2_resize_matrix(
    in_size: int, out_size: int, interp: int
) -> np.ndarray:
    """[out_size, in_size] matrix of cv2.resize float semantics for any
    interpolation mode, extracted from cv2 itself: resizing the identity
    matrix along one axis (dsize width == in_size, so fx == 1 and the
    unchanged axis is the identity map for every mode) yields exactly
    the 1-D resampling operator."""
    import cv2

    eye = np.eye(in_size, dtype=np.float32)
    return cv2.resize(eye, (in_size, out_size), interpolation=interp)


@functools.lru_cache(maxsize=64)
def _eye(size: int) -> np.ndarray:
    return np.eye(size, dtype=np.float32)


def plan_face_sample(
    draw: "D.FaceAugmentDraw", flip: bool, size: int = 112
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Compile one drawn augmentation (+ the loader's flip) into device
    plan parts (mv, mh, keep_v, keep_h, photo)."""
    if draw.lowres is not None:
        small, down, up = draw.lowres
        m = cv2_resize_matrix(small, size, up) @ cv2_resize_matrix(
            size, small, down
        )
    else:
        m = _eye(size)
    mv = m
    # Flip happens after the (spatially-uniform) photometric jitter, but
    # commutes with it — fold it into the horizontal resample.
    mh = m[::-1] if flip else m
    keep_v = np.ones(size, np.float32)
    keep_h = np.ones(size, np.float32)
    if draw.crop is not None:
        i, ch, j, cw = draw.crop
        keep_v = np.zeros(size, np.float32)
        keep_v[i : i + ch] = 1.0
        keep_h = np.zeros(size, np.float32)
        keep_h[j : j + cw] = 1.0
    photo = np.asarray(draw.photo or (1.0, 1.0, 1.0), np.float32)
    order = np.asarray(draw.photo_order, np.int32)
    return mv, mh, keep_v, keep_h, photo, order


def stack_face_plans(
    parts: Sequence[Tuple], matrix_dtype=None
) -> FaceAugmentPlan:
    """Stack per-sample plan tuples into one FaceAugmentPlan batch.
    Production ships bf16 matrices (the device resamples in bf16
    anyway); parity tests keep float32."""
    mv, mh, kv, kh, photo, order = zip(*parts)
    mdt = matrix_dtype or np.float32
    return FaceAugmentPlan(
        mv=np.ascontiguousarray(np.stack(mv)).astype(mdt),
        mh=np.ascontiguousarray(np.stack(mh)).astype(mdt),
        keep_v=np.stack(kv),
        keep_h=np.stack(kh),
        photo=np.stack(photo),
        photo_order=np.stack(order),
    )


def device_augment_faces(
    images_u8: jnp.ndarray,  # [B, S, S, 3] uint8
    plan: FaceAugmentPlan,
    resample_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Jit-able: uint8 faces + plan -> normalized float32 [B, S, S, 3]
    in [-1, 1] (the exact tensor `augment_face` + flip + `normalize_face`
    produce, up to composed-resample rounding on low-res draws).

    Order matches the host recipe: crop-zero -> resample (low-res) ->
    round/clip (cv2's uint8 cast) -> photometric -> clip + floor (the
    reference's truncating `astype(np.uint8)`) -> normalize.
    """
    prec = (
        jax.lax.Precision.HIGHEST
        if resample_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    x = images_u8.astype(resample_dtype)
    mask = (
        plan.keep_v.astype(resample_dtype)[:, :, None]
        * plan.keep_h.astype(resample_dtype)[:, None, :]
    )
    x = x * mask[..., None]
    mv = jnp.asarray(plan.mv, resample_dtype)
    mh = jnp.asarray(plan.mh, resample_dtype)
    y = jnp.einsum("brh,bhwc->brwc", mv, x, precision=prec)
    y = jnp.einsum("bow,brwc->broc", mh, y, precision=prec)
    # cv2 resize on uint8 saturate-rounds; identity matrices keep exact
    # integer values so rounding is a no-op for non-low-res samples.
    y = jnp.clip(jnp.round(y.astype(jnp.float32)), 0.0, 255.0)

    # ColorJitter with PIL ImageEnhance semantics (data.color_jitter_pil
    # is the host/oracle twin): per-sample op ORDER, ITU-R 601 luma gray
    # (the fixed-point weights sum to 65536, so every product stays an
    # exact-in-f32 integer < 2^24), blends TRUNCATED to uint8 between
    # ops. Off samples carry (1,1,1) factors: blend with factor 1 is
    # the identity on integer-valued pixels.
    b = plan.photo[:, 0][:, None, None, None]
    c = plan.photo[:, 1][:, None, None, None]
    s = plan.photo[:, 2][:, None, None, None]

    def _gray(yv):
        return jnp.floor(
            (
                yv[..., 0:1] * 19595.0
                + yv[..., 1:2] * 38470.0
                + yv[..., 2:3] * 7471.0
                + 32768.0
            )
            / 65536.0
        )

    def _blend(degen, yv, f):
        return jnp.clip(jnp.trunc(degen + f * (yv - degen)), 0.0, 255.0)

    for k in range(3):
        op = plan.photo_order[:, k][:, None, None, None]
        g = _gray(y)
        y_b = _blend(jnp.zeros_like(y), y, b)
        gmean = jnp.floor(
            jnp.mean(g, axis=(1, 2, 3), keepdims=True) + 0.5
        )
        y_c = _blend(gmean, y, c)
        y_s = _blend(g, y, s)
        y = jnp.where(op == 0, y_b, jnp.where(op == 1, y_c, y_s))
    # The host ends with np.clip + a TRUNCATING astype(np.uint8) —
    # already integer-valued here; floor+clip kept for the no-photo path.
    y = jnp.floor(jnp.clip(y, 0.0, 255.0))
    return (y / 255.0 - 0.5) / 0.5


def device_face_train_loader(
    dataset: "D.ImageFolderDataset",
    batch_size: int,
    seed: int = 0,
    num_workers: int = 8,
    drop_last: bool = True,
    matrix_dtype=ml_dtypes.bfloat16,
):
    """Device-augmentation twin of `recognition_train_loader`: yields
    (images_u8 [B,S,S,3], FaceAugmentPlan, labels [B]). Host pixel work
    is decode (+ one resize for off-size sources) only; the per-index
    rng streams match the host loader's exactly, so the produced
    augmentations are the host loader's augmentations."""
    import concurrent.futures as cf

    size = dataset.output_size
    order = np.random.default_rng(seed).permutation(len(dataset))
    pool = cf.ThreadPoolExecutor(max_workers=num_workers)

    def fetch(idx):
        import cv2
        from PIL import Image

        path, label = dataset.samples[int(idx)]
        img = np.asarray(Image.open(path).convert("RGB"))
        if dataset.swap_color_channel:
            img = img[:, :, ::-1]
        if img.shape[:2] != (size, size):
            img = cv2.resize(img, (size, size))
        rng = np.random.default_rng(
            (seed * 1_000_003 + int(idx) * 7919) & 0x7FFFFFFF
        )
        draw = D.draw_face_augment_params(
            rng,
            size,
            size,
            dataset.crop_prob,
            dataset.low_res_prob,
            dataset.photometric_prob,
        )
        flip = rng.random() < 0.5  # RandomHorizontalFlip draw
        return np.ascontiguousarray(img), plan_face_sample(
            draw, flip, size
        ), label

    try:
        cursor = 0
        while cursor + batch_size <= len(order) or (
            not drop_last and cursor < len(order)
        ):
            idxs = order[cursor : cursor + batch_size]
            cursor += batch_size
            results = list(pool.map(fetch, idxs))
            images = np.stack([r[0] for r in results])
            plan = stack_face_plans(
                [r[1] for r in results], matrix_dtype=matrix_dtype
            )
            labels = np.asarray([r[2] for r in results], np.int32)
            yield images, plan, labels
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
