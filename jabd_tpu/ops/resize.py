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
