"""Fused expand-1x1 + depthwise-3x3 Pallas kernel (MobileNetV3 hot path).

Motivation: in the MNV3 bottleneck (nets/mobilenetV3.py:94-150) the
expand conv produces the block's LARGEST tensor (expand ratio 3-6x), and
XLA does not fuse conv->conv, so that tensor round-trips HBM between the
expand 1x1 and the depthwise 3x3. At 640x640 the backbone is ~83% of
end-to-end inference time and is HBM-bound. This kernel computes

    y = act(bn2(dwconv3x3(act(bn1(conv1x1(x))))))

per spatial row-tile entirely in VMEM: the expanded activation never
touches HBM. BN is folded into (scale, bias) pairs by the caller
(inference mode). The 1x1 expand is an MXU matmul over
[(TH+2)*(W+2), Cin] x [Cin, E]; the depthwise conv is 9 shifted
multiply-accumulates on the VPU.

Scope: stride 1, kernel 3x3 (the repeated stride-1 blocks carry most of
the traffic; stride-2 blocks use the XLA path). Eval mode only — training
keeps the flax path for BN statistics.

STATUS (v5e measurements, bs=32): numerically exact (parity-tested vs the
composed op), but NOT yet faster than XLA's lax.conv pipeline
(0.67-0.81x on the flagship block shapes) — XLA's conv kernels beat this
first cut despite the extra HBM round-trip. Not wired into the model.
Tuning directions before integration: avoid the channel pad-to-128 (pack
rows into sublanes instead), bf16 depthwise accumulation, wider row
tiles, fusing the project 1x1 (for the non-ECA blocks) so the dw output
also stays in VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(name: str, x):
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "hswish":
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    raise ValueError(name)


def _kernel(x_hbm, w1_ref, s1_ref, b1_ref, wdw_ref, s2_ref, b2_ref,
            out_ref, xs, sem, *, th: int, w: int, wp: int, hh: int,
            cin: int, e: int, ntiles: int, act: str):
    """wp = padded width (W+2 rounded up to the 8-sublane tiling — DMA
    slices along a tiled dim must be tile-aligned).

    Double-buffered: the grid is the flattened (batch, tile) sequence and
    each step prefetches the NEXT tile's halo'd rows while computing the
    current one (xs has 2 slots)."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    b = step // ntiles
    i = step - b * ntiles
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    def dma_for(s):
        bb = s // ntiles
        ii = s - bb * ntiles
        return bb, ii

    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * th, th + 2)], xs.at[slot], sem.at[slot]
        ).start()

    @pl.when(step + 1 < nsteps)
    def _():
        nb, ni = dma_for(step + 1)
        pltpu.make_async_copy(
            x_hbm.at[nb, pl.ds(ni * th, th + 2)], xs.at[nxt], sem.at[nxt]
        ).start()

    pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2)], xs.at[slot], sem.at[slot]
    ).wait()

    rows = (th + 2) * wp
    h = jnp.dot(
        xs[slot].reshape(rows, cin),
        w1_ref[:],
        preferred_element_type=jnp.float32,
    )
    h = _act(act, h * s1_ref[:] + b1_ref[:])
    # The torch pipeline zero-pads AFTER expand+act (the depthwise conv
    # pads its input), so halo positions that fall outside the image must
    # contribute 0 — not act(bias1). Mask them out. The mask is computed
    # from the LINEAR row index (Mosaic cannot shape-cast 2-D i1 masks).
    lin = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    r = lin // wp
    c = lin - r * wp
    gr = r + i * th  # global padded row index
    inside = (gr > 0) & (gr < hh + 1) & (c > 0) & (c < w + 1)
    h = jnp.where(inside, h, 0.0)
    h = h.astype(out_ref.dtype).reshape(th + 2, wp, e)

    acc = jnp.zeros((th, w, e), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            acc += (
                h[dr : dr + th, dc : dc + w, :].astype(jnp.float32)
                * wdw_ref[dr * 3 + dc, :]
            )
    out = _act(act, acc * s2_ref[:] + b2_ref[:])
    out_ref[0] = out.astype(out_ref.dtype)


def _pick_tile(h: int) -> int:
    for th in (16, 10, 8, 5, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def fused_expand_dw(
    x: jnp.ndarray,  # [B, H, W, Cin]
    w1: jnp.ndarray,  # [Cin, E]
    scale1: jnp.ndarray,  # [E] folded BN scale
    bias1: jnp.ndarray,  # [E]
    wdw: jnp.ndarray,  # [3, 3, E] depthwise weights
    scale2: jnp.ndarray,  # [E]
    bias2: jnp.ndarray,  # [E]
    act: str = "relu",
    interpret: bool = False,
) -> jnp.ndarray:
    """act(bn2(dw3x3(act(bn1(1x1(x)))))) without materializing the
    expanded map in HBM. Returns [B, H, W, E] in x.dtype."""
    bsz, h, w, cin = x.shape
    e = w1.shape[1]
    th = _pick_tile(h)
    wp = ((w + 2 + 7) // 8) * 8  # align the DMA'd width to the sublane tile
    # The HBM buffer is physically lane-padded to 128 channels; DMA slices
    # must cover whole lanes, so pad the logical channel dim to match (the
    # padded lanes move over the bus either way) and zero-pad w1's rows.
    cp = ((cin + 127) // 128) * 128
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, wp - w - 1), (0, cp - cin))
    )
    w1p = jnp.pad(w1, ((0, cp - cin), (0, 0)))

    ntiles = h // th
    out = pl.pallas_call(
        functools.partial(
            _kernel, th=th, w=w, wp=wp, hh=h, cin=cp, e=e,
            ntiles=ntiles, act=act,
        ),
        grid=(bsz * ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, e),
            lambda s, nt=ntiles: (s // nt, s % nt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, e), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        xp,
        w1p.astype(x.dtype),
        scale1.astype(jnp.float32),
        bias1.astype(jnp.float32),
        wdw.reshape(9, e).astype(jnp.float32),
        scale2.astype(jnp.float32),
        bias2.astype(jnp.float32),
    )
    return out


def fold_bn(
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BN(y) = y * scale + bias with scale = gamma/sqrt(var+eps)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale


def reference_expand_dw(x, w1, scale1, bias1, wdw, scale2, bias2, act):
    """XLA reference used for parity tests."""
    h = jnp.einsum("bhwc,ce->bhwe", x.astype(jnp.float32), w1.astype(jnp.float32))
    h = _act(act, h * scale1 + bias1)
    h = h.astype(x.dtype)
    e = w1.shape[1]
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros(x.shape[:3] + (e,), jnp.float32)
    H, W = x.shape[1], x.shape[2]
    for dr in range(3):
        for dc in range(3):
            acc += (
                hp[:, dr : dr + H, dc : dc + W, :].astype(jnp.float32)
                * wdw[dr, dc]
            )
    return _act(act, acc * scale2 + bias2).astype(x.dtype)
