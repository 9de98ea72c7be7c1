"""Resize and adaptive pooling as static per-axis matrices (MXU matmuls).

The reference FPN upsamples with `F.interpolate` — nearest
(nets/layers.py:106,114) or bicubic align_corners=True in the flagship
(train_mobilenetV3_ecagai.py:270,279) — and the PSP module pools with
`nn.AdaptiveAvgPool2d` (nets/retinaface_eca_nonlocal.py:133-152).

TPU-first design: all of these are *linear* maps along H and W with
weights that depend only on (in_size, out_size, mode) — static under jit.
We materialize the [out, in] interpolation matrix per axis with numpy at
trace time and apply it as two einsums, which XLA lowers onto the MXU.
This gives bit-accurate PyTorch semantics (including bicubic A = -0.75 and
align_corners=True index mapping, a known mismatch vs jax.image.resize —
SURVEY.md section 7 hard part (d)) *and* turns resize into matmul FLOPs
instead of gather traffic.

All functions take/return NHWC tensors.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # PyTorch's bicubic coefficient (cubic convolution, Keys 1981)


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """4-tap cubic convolution weights at fractional offset t in [0,1).

    Matches ATen's upsample_bicubic2d weight computation with A=-0.75.
    Returns [..., 4] weights for taps (floor-1, floor, floor+1, floor+2).
    """
    a = _A

    def w1(x):  # |x| <= 1
        return ((a + 2) * x - (a + 3)) * x * x + 1

    def w2(x):  # 1 < |x| < 2
        return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a

    return np.stack([w2(t + 1), w1(t), w1(1 - t), w2(2 - t)], axis=-1)


@functools.lru_cache(maxsize=256)
def resize_matrix(
    in_size: int, out_size: int, mode: str, align_corners: bool = True
) -> np.ndarray:
    """[out_size, in_size] float32 interpolation matrix, torch semantics.

    mode: 'nearest' | 'bilinear' | 'bicubic'.
    nearest ignores align_corners (torch nearest uses floor(i*in/out)).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "nearest":
        src = np.floor(np.arange(out_size) * (in_size / out_size)).astype(int)
        src = np.clip(src, 0, in_size - 1)
        m[np.arange(out_size), src] = 1.0
        return m.astype(np.float32)

    # Real-valued source coordinate per output index.
    if align_corners:
        if out_size == 1:
            x = np.zeros(out_size)
        else:
            x = np.arange(out_size) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        x = np.clip((np.arange(out_size) + 0.5) * scale - 0.5, 0, None)

    x0 = np.floor(x).astype(int)
    t = x - x0

    if mode == "bilinear":
        i0 = np.clip(x0, 0, in_size - 1)
        i1 = np.clip(x0 + 1, 0, in_size - 1)
        for r in range(out_size):
            m[r, i0[r]] += 1 - t[r]
            m[r, i1[r]] += t[r]
        return m.astype(np.float32)

    if mode == "bicubic":
        w = _cubic_weights(t)  # [out, 4]
        for k in range(4):
            idx = np.clip(x0 - 1 + k, 0, in_size - 1)
            for r in range(out_size):
                m[r, idx[r]] += w[r, k]
        return m.astype(np.float32)

    raise ValueError(f"unknown resize mode {mode!r}")


@functools.lru_cache(maxsize=256)
def adaptive_avg_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] matrix of nn.AdaptiveAvgPool semantics:
    bin i averages rows [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m.astype(np.float32)


def _apply_hw(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply per-axis matrices to NHWC x: out[b,H,W,c] =
    sum_hw mh[H,h] mw[W,w] x[b,h,w,c].

    Forced to full (HIGHEST) matmul precision: interpolation weights must
    not be rounded to bf16 (the default matmul precision), or nearest /
    adaptive-pool would stop being exact.
    """
    dt = x.dtype
    mh_ = jnp.asarray(mh, dtype=dt)
    mw_ = jnp.asarray(mw, dtype=dt)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("bhwc,Hh->bHwc", x, mh_, precision=hi)
    x = jnp.einsum("bhwc,Ww->bhWc", x, mw_, precision=hi)
    return x


def resize(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    mode: str = "nearest",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Resize NHWC x to (H', W') with PyTorch F.interpolate semantics."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = resize_matrix(h, oh, mode, align_corners)
    mw = resize_matrix(w, ow, mode, align_corners)
    return _apply_hw(x, mh, mw)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """nn.AdaptiveAvgPool2d on NHWC x."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    mh = adaptive_avg_pool_matrix(h, oh)
    mw = adaptive_avg_pool_matrix(w, ow)
    return _apply_hw(x, mh, mw)


# ---------------------------------------------------------------------------
# Per-sample tap builders (dynamic in/out sizes, host-built matrices).
#
# Unlike resize_matrix above (trace-time constants for sizes known at
# compile), these serve pipelines where the geometry varies PER SAMPLE
# (device augmentation, batched heterogeneous letterbox): the host builds
# a dense [canvas, bucket] matrix per image, the device applies it as a
# batched MXU contraction. One compile covers any source-size mix.
# ---------------------------------------------------------------------------

_PIL_A = -0.5  # PIL's bicubic coefficient (vs torch/cv2's -0.75)


def _pil_bicubic_filter(x: np.ndarray) -> np.ndarray:
    """Pillow's bicubic kernel (Resample.c bicubic_filter, a=-0.5)."""
    a = _PIL_A
    x = np.abs(x)
    near = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    far = (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return np.where(x < 1.0, near, np.where(x < 2.0, far, 0.0))


def pil_bicubic_taps(
    in_size: int, out_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """PIL precompute_coeffs: per output index, first source tap +
    normalized ANTIALIASED weights (support widens on downscale).

    Returns (xmin [out], weights [out, ksize]); taps are the contiguous
    range xmin..xmin+ksize-1 with trailing zero weights past the window
    (all real-tap indices stay inside [0, in_size))."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1

    center = (np.arange(out_size) + 0.5) * scale
    xmin = np.clip((center - support + 0.5).astype(np.int64), 0, None)
    xmax = np.minimum((center + support + 0.5).astype(np.int64), in_size)
    count = xmax - xmin

    taps = xmin[:, None] + np.arange(ksize)[None, :]
    w = _pil_bicubic_filter((taps - center[:, None] + 0.5) / filterscale)
    w = np.where(np.arange(ksize)[None, :] < count[:, None], w, 0.0)
    ww = w.sum(axis=1, keepdims=True)
    w = np.divide(w, ww, out=np.zeros_like(w), where=ww != 0.0)
    return xmin, w.astype(np.float32)


def cv2_bilinear_taps(
    in_size: int, out_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """cv2.resize INTER_LINEAR float semantics: half-pixel centers, two
    taps, NO antialiasing on downscale (what the reference letterbox
    uses, utils/utils.py:15). Same (xmin, weights) contract as
    pil_bicubic_taps."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(src).astype(np.int64)
    t = (src - x0).astype(np.float32)
    # Edge clamp: out-of-range taps collapse onto the border pixel.
    lo = np.clip(x0, 0, in_size - 1)
    hi = np.clip(x0 + 1, 0, in_size - 1)
    xmin = np.minimum(lo, hi)
    w = np.zeros((out_size, 2), np.float32)
    np.add.at(w, (np.arange(out_size), lo - xmin), 1.0 - t)
    np.add.at(w, (np.arange(out_size), hi - xmin), t)
    return xmin, w


def cv2_cubic_taps(
    in_size: int, out_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """cv2.resize INTER_CUBIC float semantics: half-pixel centers, 4-tap
    Keys cubic (A=-0.75 — the same kernel constant as torch), border-
    replicate tap clamp, NO antialiasing on downscale and NO source-
    coordinate clip (unlike torch align_corners=False, cv2 lets the
    half-pixel center go negative at the top edge and clamps the taps
    instead). This is the resize Predictor.detect_multiscale runs on the
    float32 frame (predict.py:413-417). Same (xmin, weights) contract as
    pil_bicubic_taps: window start + 4 weights, out-of-range taps
    accumulated onto the border pixel inside the window."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(src).astype(np.int64)
    w = _cubic_weights((src - x0).astype(np.float64)).astype(np.float32)
    xmin = np.clip(x0 - 1, 0, max(in_size - 4, 0))
    out_w = np.zeros((out_size, 4), np.float32)
    rows = np.arange(out_size)
    for j in range(4):
        cols = np.clip(x0 - 1 + j, 0, in_size - 1) - xmin
        np.add.at(out_w, (rows, cols), w[:, j])
    return xmin, out_w


def compose_scale_letterbox_taps(
    in_size: int,
    mid_size: int,
    out_len: int,
    offset: int,
    canvas: int,
    k_max: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fuse the image-pyramid's two host resizes into ONE taps-form plan
    over the ORIGINAL source axis: cv2-cubic (in_size -> mid_size, the
    pre-scale) composed with cv2-bilinear (mid_size -> out_len, the
    letterbox fit) pasted at `offset` on a `canvas`-long axis. Both maps
    are linear, so the composition is exact up to f32 association — the
    device never materializes the scaled intermediate, and each scale of
    the pyramid reuses the SAME uint8 source upload.

    The composite window spans at most 4 + ceil(in/mid) source taps (two
    adjacent bilinear taps, each pulling a 4-tap cubic window); asserts
    it fits k_max. Returns (xmin [canvas] int32, w [canvas, k_max]
    float32, inside [canvas] float32) with all-zero weight rows outside
    the pasted span (callers add the gray fill).
    """
    cx, cw = cv2_cubic_taps(in_size, mid_size)
    px, pw, inside = paste_resize_taps(
        mid_size, out_len, offset, canvas, taps=cv2_bilinear_taps, k_max=2
    )
    j0 = px.astype(np.int64)
    j1 = np.minimum(j0 + 1, mid_size - 1)
    start = np.minimum(cx[j0], cx[j1])
    k_req = int(np.max(np.maximum(cx[j0], cx[j1]) + 4 - start)) if canvas else 0
    assert k_req <= k_max, (
        f"composite tap window {k_req} exceeds k_max={k_max} "
        f"(in={in_size}, mid={mid_size}) — raise k_max or pre-shrink"
    )
    w = np.zeros((canvas, k_max), np.float32)
    rows = np.arange(canvas)
    for q, jq in enumerate((j0, j1)):
        off = cx[jq] - start
        for t in range(4):
            np.add.at(w, (rows, off + t), pw[:, q] * cw[jq, t])
    w *= inside[:, None]
    return start.astype(np.int32), w, inside


def paste_resize_matrix(
    in_size: int,
    out_len: int,
    offset: int,
    canvas: int,
    bucket: int,
    flip: bool = False,
    taps=pil_bicubic_taps,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense [canvas, bucket] matrix composing a resize (in_size ->
    out_len, semantics from `taps`) with a paste at `offset` (negative
    crops) and an optional output flip. Rows outside the pasted span are
    all-zero; `inside` marks pasted rows (callers add the gray fill)."""
    m = np.zeros((canvas, bucket), np.float32)
    inside = np.zeros((canvas,), np.float32)
    eff = max(out_len, 1)
    xmin, w = taps(in_size, eff)
    ksize = w.shape[1]

    lo = max(0, offset)
    hi = min(canvas, offset + eff)
    if hi > lo:
        o = np.arange(lo, hi)  # canvas indices covered by the paste
        u = o - offset  # resized-image indices
        cols = np.minimum(
            xmin[u][:, None] + np.arange(ksize)[None, :], in_size - 1
        )
        # Rows whose zero-weight tail taps clip onto in_size-1 need
        # accumulating writes (duplicate columns; numpy fancy assignment
        # does NOT guarantee write order). Those are only the few
        # right-edge rows — everything else takes the ~5x faster unique-
        # column fancy assignment.
        clipped = xmin[u] > in_size - ksize
        clean = ~clipped
        if clean.any():
            m[o[clean][:, None], cols[clean]] = w[u][clean]
        if clipped.any():
            np.add.at(
                m, (o[clipped][:, None], cols[clipped]), w[u][clipped]
            )
        inside[lo:hi] = 1.0
    if flip:
        # Negative-stride views are fine: batch assembly copies.
        m = m[::-1]
        inside = inside[::-1]
    return m, inside


# Static tap budget of the compact (taps-form) plan shipping. Rows never
# carry more than TAPS_K weights because plan builders pre-shrink any
# source axis whose downscale factor exceeds TAPS_FSCAP (antialiased
# support 2*fscale per side -> ksize = 2*ceil(2*fscale)+1 <= 31).
TAPS_FSCAP = 7.5
TAPS_K = 32


def paste_resize_taps(
    in_size: int,
    out_len: int,
    offset: int,
    canvas: int,
    flip: bool = False,
    taps=pil_bicubic_taps,
    k_max: int = TAPS_K,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact (taps-form) equivalent of `paste_resize_matrix`: per canvas
    row, the first source tap index and k_max weights, instead of a dense
    [canvas, bucket] matrix. Shipping this form cuts the plan's H2D bytes
    ~bucket/k_max-fold (the dense matrices dominated device-augment H2D
    through the remote tunnel: 252 of ~550 MB/batch at bs=96/bucket
    1024²); the device rebuilds the dense matrix with a k_max-step
    iota-compare accumulation (ops/resize.expand_taps) and runs the same
    MXU einsums.

    Returns (xmin [canvas] int32, w [canvas, k_max] float32,
    inside [canvas] float32). Rows outside the pasted span have all-zero
    weights. Requires in_size <= TAPS_FSCAP * max(out_len, 1) * 2 + k_max
    headroom — callers guarantee it by pre-shrinking (see
    device_augment.plan_sample); asserts otherwise.
    """
    xmin_c = np.zeros((canvas,), np.int32)
    w_c = np.zeros((canvas, k_max), np.float32)
    inside = np.zeros((canvas,), np.float32)
    eff = max(out_len, 1)
    xmin, w = taps(in_size, eff)
    ksize = w.shape[1]

    lo = max(0, offset)
    hi = min(canvas, offset + eff)
    if hi > lo:
        o = np.arange(lo, hi)  # canvas indices covered by the paste
        u = o - offset  # resized-image indices
        if ksize > k_max:
            # Trailing taps past each row's count are zero-weight; they
            # only exceed k_max when the antialias window does, which the
            # pre-shrink contract forbids. Verify, then truncate.
            assert not np.any(w[u][:, k_max:] != 0.0), (
                "tap window exceeds TAPS_K — caller must pre-shrink "
                f"(in={in_size}, out={out_len})"
            )
        xm = xmin[u].astype(np.int64)
        wr = np.zeros((len(u), k_max), np.float32)
        wr[:, : min(ksize, k_max)] = w[u][:, :k_max]
        # Right-edge clip: dense form accumulates taps clipped onto
        # in_size-1; re-lay the weights against a shifted window start so
        # the device needs no per-sample clamp (all xm+k either fall
        # inside the source or carry zero weight).
        clipped = xm > in_size - min(ksize, k_max)
        for r in np.nonzero(clipped)[0]:
            cols = np.minimum(xm[r] + np.arange(k_max), in_size - 1)
            new_xm = max(0, min(int(xm[r]), in_size - k_max))
            neww = np.zeros((k_max,), np.float32)
            np.add.at(neww, cols - new_xm, wr[r])
            xm[r] = new_xm
            wr[r] = neww
        xmin_c[lo:hi] = xm
        w_c[lo:hi] = wr
        inside[lo:hi] = 1.0
    if flip:
        xmin_c = xmin_c[::-1]
        w_c = w_c[::-1]
        inside = inside[::-1]
    return xmin_c, w_c, inside


def expand_taps(
    xmin: "jnp.ndarray",  # [B, S] int32
    w: "jnp.ndarray",  # [B, S, K]
    bucket: int,
    dtype=jnp.bfloat16,
) -> "jnp.ndarray":
    """Jit-able: rebuild the dense [B, S, bucket] resample matrix from
    taps form. K iota-compare accumulation passes (K static, 32) — VPU
    work traded for ~bucket/K less H2D."""
    b, s, k_max = w.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bucket), 2)
    w = w.astype(dtype)

    def body(k, acc):
        idx = (xmin + k)[:, :, None]  # [B, S, 1]
        wk = jax.lax.dynamic_slice_in_dim(w, k, 1, axis=2)  # [B, S, 1]
        return acc + jnp.where(col == idx, wk, jnp.zeros((), dtype))

    acc = jnp.zeros((b, s, bucket), dtype)
    return jax.lax.fori_loop(0, k_max, body, acc)


def resample_canvas(
    images_u8: jnp.ndarray,  # [B, bucket_h, bucket_w, 3] uint8
    mv: jnp.ndarray,  # [B, S, bucket_h]
    mh: jnp.ndarray,  # [B, S, bucket_w]
    inside_v: jnp.ndarray,  # [B, S]
    inside_h: jnp.ndarray,  # [B, S]
    fill: float,
    resample_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Apply per-sample separable resample+paste matrices and the gray
    fill: returns float32 [B, S, S, 3] in [0, 255]. Shared by device
    augmentation (fill 128) and batched device letterbox (fill 84)."""
    x = images_u8.astype(resample_dtype)
    mv = jnp.asarray(mv, resample_dtype)
    mh = jnp.asarray(mh, resample_dtype)
    prec = (
        jax.lax.Precision.HIGHEST
        if resample_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    # Vertical: [B,S,bh] x [B,bh,bw,3] -> [B,S,bw,3]; PIL clamps each
    # pass to uint8 range (bicubic overshoot), we clamp without rounding.
    y = jnp.einsum("brh,bhwc->brwc", mv, x, precision=prec)
    y = jnp.clip(y, 0.0, 255.0)
    y = jnp.einsum("bow,brwc->broc", mh, y, precision=prec)
    y = jnp.clip(jnp.round(y.astype(jnp.float32)), 0.0, 255.0)

    inside = (
        inside_v.astype(jnp.float32)[:, :, None]
        * inside_h.astype(jnp.float32)[:, None, :]
    )[..., None]
    return y * inside + fill * (1.0 - inside)
