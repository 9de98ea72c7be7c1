"""Fused Pallas kernel for anchor<->GT matching (the IoU front half).

BASELINE.json's north star names matching as a fused-kernel target: the
XLA version (ops/matching.py) materializes the [B, G, P] overlap tensor
(34 x 128 x 29126 f32 = 0.5 GB) plus reduction passes over it. This
kernel never materializes it: priors stream through VMEM in columnar
tiles and a G-step loop keeps only the running per-prior best
(overlap, index) plus per-GT tile maxima — O(P) memory instead of
O(G*P).

The tail (forced best-prior match, thresholding, encode) is shared with
the XLA path via matching.finish_match, so both produce bit-identical
MatchResults; tie-breaking matches jnp.argmax (first maximum wins — the
kernel updates on strict '>' over ascending g / ascending tile index).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jabd_tpu.ops.matching import MatchResult, finish_match

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(truths_ref, pcols_ref, bt_ov_ref, bt_ix_ref, gmax_ref,
            garg_ref, *, tile: int, g: int, gp: int):
    """Grid (B, n_tiles). Refs (outputs use 8 broadcast sublanes — TPU
    block shapes need >=8 in the second-to-last dim):
      truths_ref: [1, GP, 8] VMEM  (x1, y1, x2, y2, area, valid, 0, 0)
      pcols_ref:  [8, TILE] VMEM   (px1, py1, px2, py2, parea, ...)
      bt_ov_ref:  [1, 1, 8, TILE]  per-prior best overlap (-1 pad GTs)
      bt_ix_ref:  [1, 1, 8, TILE] i32  per-prior best GT index
      gmax_ref:   [1, 1, 8, GP]    per-GT max overlap within this tile
      garg_ref:   [1, 1, 8, GP] i32  per-GT GLOBAL prior index of that max
    """
    t = pl.program_id(1)
    px1 = pcols_ref[0:1, :]
    py1 = pcols_ref[1:2, :]
    px2 = pcols_ref[2:3, :]
    py2 = pcols_ref[3:4, :]
    parea = pcols_ref[4:5, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    base = t * tile
    # 8 GTs per loop iteration, one per sublane: the serial G-loop was the
    # bottleneck of the 1-GT-per-step version (2.3x slower than XLA).
    gsteps = gp // 8
    gsp = ((gsteps + 127) // 128) * 128
    slane = jax.lax.broadcasted_iota(jnp.int32, (8, gsp), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(s, carry):
        bt_ov, bt_ix, gmax, garg = carry
        g0 = s * 8
        blk = truths_ref[0, pl.ds(g0, 8), :]  # [8, 8]
        tx1 = blk[:, 0:1]
        ty1 = blk[:, 1:2]
        tx2 = blk[:, 2:3]
        ty2 = blk[:, 3:4]
        tarea = blk[:, 4:5]
        tvalid = blk[:, 5:6] > 0.5  # [8, 1]

        iw = jnp.maximum(jnp.minimum(tx2, px2) - jnp.maximum(tx1, px1), 0.0)
        ih = jnp.maximum(jnp.minimum(ty2, py2) - jnp.maximum(ty1, py1), 0.0)
        inter = iw * ih  # [8, tile]
        union = tarea + parea - inter
        iou = inter / jnp.where(union > 0, union, 1.0)
        iou = jnp.where(tvalid, iou, -1.0)  # [8, tile]

        # Tournament over the 8 sublanes keeping (val, gt_idx). argmax
        # semantics need the LOWEST index among tied maxima — a strict
        # '>' alone is not enough once winners from different pairing
        # branches meet (e.g. ties at sublanes 2 and 4 pair 4 against
        # the round-1 winner of (0,4) and '>' would keep 4), so ties
        # compare the carried indices explicitly.
        vals = iou
        idxs = jnp.broadcast_to(g0 + sub, (8, tile))
        for half in (4, 2, 1):
            hi_v = vals[half : 2 * half, :]
            hi_i = idxs[half : 2 * half, :]
            lo_v = vals[:half, :]
            lo_i = idxs[:half, :]
            take = (hi_v > lo_v) | ((hi_v == lo_v) & (hi_i < lo_i))
            vals = jnp.where(take, hi_v, lo_v)
            idxs = jnp.where(take, hi_i, lo_i)
        best_v = vals[0:1, :]
        best_i = idxs[0:1, :]
        upd = best_v > bt_ov
        bt_ov = jnp.where(upd, best_v, bt_ov)
        bt_ix = jnp.where(upd, best_i, bt_ix)

        # Per-GT best prior inside this tile (rows independent); first
        # lane wins ties. Accumulate in [8, GSP] laid out as [sublane=r,
        # lane=step] — ONE masked select per step; the host reorders to
        # g = s*8 + r afterwards.
        m8 = jnp.max(iou, axis=1, keepdims=True)  # [8, 1]
        first8 = jnp.min(
            jnp.where(iou == m8, lane, tile), axis=1, keepdims=True
        )  # [8, 1]
        sel = slane == s
        gmax = jnp.where(sel, m8, gmax)
        garg = jnp.where(sel, base + first8, garg)
        return bt_ov, bt_ix, gmax, garg

    init = (
        jnp.full((1, tile), -1.0, jnp.float32),
        jnp.zeros((1, tile), jnp.int32),
        jnp.full((8, gsp), -1.0, jnp.float32),
        jnp.zeros((8, gsp), jnp.int32),
    )
    # Loop only through the last valid GT row (batch_targets packs valid
    # rows as a prefix; typical images have ~10 GTs vs G=128 padding).
    # Untouched gts keep gmax=-1 / bt untouched — finish_match masks them.
    vcol = truths_ref[0, :, 5:6]  # [gp, 1]
    gidx = jax.lax.broadcasted_iota(jnp.int32, (gp, 1), 0)
    last = jnp.max(jnp.where(vcol > 0.5, gidx + 1, 0))
    steps = (last + 7) // 8
    bt_ov, bt_ix, gmax, garg = jax.lax.fori_loop(0, steps, body, init)
    bt_ov_ref[0, 0] = jnp.broadcast_to(bt_ov, (8, tile))
    bt_ix_ref[0, 0] = jnp.broadcast_to(bt_ix, (8, tile))
    gmax_ref[0, 0] = gmax
    garg_ref[0, 0] = garg


@functools.partial(jax.jit, static_argnames=("interpret",))
def _match_front(
    truths: jnp.ndarray,  # [B, G, 4] corner form (padded)
    priors: jnp.ndarray,  # [P, 4] cxcywh
    valid: jnp.ndarray,  # [B, G]
    interpret: bool = False,
):
    """Returns (best_truth_overlap [B, P], best_truth_idx [B, P],
    best_prior_idx [B, G]) identical to the XLA argmax formulation."""
    bsz, g = truths.shape[:2]
    p = priors.shape[0]
    tile = 4096 if p >= 4096 else _round_up(p, _LANES)
    pp = _round_up(p, tile)
    ntiles = pp // tile
    gp = _round_up(g, _LANES)
    gsteps = gp // 8
    gsp = _round_up(gsteps, _LANES)

    # Columnar priors in point form; padded priors get impossible boxes
    # whose IoU with anything is 0 but still < any real overlap... they
    # are sliced away after the kernel, so values don't matter.
    px1 = priors[:, 0] - priors[:, 2] / 2
    py1 = priors[:, 1] - priors[:, 3] / 2
    px2 = priors[:, 0] + priors[:, 2] / 2
    py2 = priors[:, 1] + priors[:, 3] / 2
    parea = (px2 - px1) * (py2 - py1)
    pcols = jnp.zeros((8, pp), jnp.float32)
    for i, v in enumerate((px1, py1, px2, py2, parea)):
        pcols = pcols.at[i, :p].set(v)

    tarea = (truths[..., 2] - truths[..., 0]) * (
        truths[..., 3] - truths[..., 1]
    )
    # Pad GT rows to gp (multiple of 128): padded rows carry valid=0 and
    # never win; their gmax/garg lanes are sliced off after the kernel.
    tin = jnp.zeros((bsz, gp, 8), jnp.float32)
    tin = tin.at[:, :g, :4].set(truths)
    tin = tin.at[:, :g, 4].set(tarea)
    tin = tin.at[:, :g, 5].set(jnp.where(valid, 1.0, 0.0))

    bt_ov, bt_ix, gmax, garg = pl.pallas_call(
        functools.partial(_kernel, tile=tile, g=g, gp=gp),
        grid=(bsz, ntiles),
        in_specs=[
            pl.BlockSpec((1, gp, 8), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda b, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 8, tile), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, tile), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, gsp), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, gsp), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ntiles, 8, tile), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ntiles, 8, tile), jnp.int32),
            jax.ShapeDtypeStruct((bsz, ntiles, 8, gsp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ntiles, 8, gsp), jnp.int32),
        ),
        interpret=interpret,
    )(tin, pcols)

    bt_ov = bt_ov[:, :, 0, :].reshape(bsz, pp)
    bt_ix = bt_ix[:, :, 0, :].reshape(bsz, pp)
    # Kernel layout [r, step] -> g = step*8 + r: transpose + reshape.
    gmax = jnp.transpose(
        gmax[:, :, :, :gsteps], (0, 1, 3, 2)
    ).reshape(bsz, ntiles, gp)[:, :, :g]
    garg = jnp.transpose(
        garg[:, :, :, :gsteps], (0, 1, 3, 2)
    ).reshape(bsz, ntiles, gp)[:, :, :g]
    best_truth_overlap = bt_ov[:, :p]
    best_truth_idx = bt_ix[:, :p]
    # Combine per-tile GT maxima; first tile wins ties (argmax semantics).
    win_tile = jnp.argmax(gmax, axis=1)  # [B, G]
    best_prior_idx = jnp.take_along_axis(
        garg, win_tile[:, None, :], axis=1
    )[:, 0, :]
    return best_truth_overlap, best_truth_idx, best_prior_idx


def match_batch_pallas(
    threshold: float,
    truths: jnp.ndarray,  # [B, G, 4]
    priors: jnp.ndarray,  # [P, 4]
    variances: Tuple[float, float],
    labels: jnp.ndarray,  # [B, G]
    landms: jnp.ndarray,  # [B, G, 10]
    valid: jnp.ndarray,  # [B, G]
    interpret: bool = False,
) -> MatchResult:
    """Drop-in twin of matching.match_batch with the Pallas front half."""
    bt_ov, bt_ix, bp_ix = _match_front(
        truths, priors, valid, interpret=interpret
    )
    fn = jax.vmap(
        lambda ov, ix, bp, t, l, lm, v: finish_match(
            threshold, ov, ix, bp, t, priors, variances, l, lm, v
        )
    )
    return fn(bt_ov, bt_ix, bp_ix, truths, labels, landms, valid)
