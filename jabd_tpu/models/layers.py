"""Shared NN building blocks (Flax, NHWC).

TPU-native re-designs of the reference blocks:
  * conv_bn / conv_bn1x1 / conv_bn_no_relu — nets/layers.py:10-32
  * SSH context module                     — nets/layers.py:37-68
  * FPN (3/4-level, configurable upsample + NLM) — nets/layers.py:70-326,
    nets/retinaface_eca_nonlocal.py:37-90,
    train_mobilenetV3_ecagai.py:231-285
  * ECA / contrast-ECA ("GAI")             — nets/mobilenetV3.py:332-378
  * SE module                              — nets/mobilenetV3.py:18-32
  * NLM + PSP (CSAF non-local fusion)      — nets/retinaface_eca_nonlocal.py:133-200
  * Class/Bbox/Landmark/IOU heads          — nets/retinaface_eca_nonlocal.py:95-132,223-232

Layout: NHWC throughout (TPU-preferred). Convolutions use explicit
symmetric padding k//2 to match torch Conv2d(padding=k//2) output grids
(XLA 'SAME' would shift positions for even inputs at stride 2).

Dtype policy: parameters live in float32; `dtype` selects the compute
dtype (bfloat16 on TPU for MXU throughput). BatchNorm statistics stay
float32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jabd_tpu.ops import resize as R

Dtype = Any


# ---------------------------------------------------------------------------
# Activations (torch-semantics)
# ---------------------------------------------------------------------------


def hswish(x):
    """x * relu6(x + 3) / 6 — nets/mobilenetV3.py:6-9."""
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hsigmoid(x):
    """relu6(x + 3) / 6 — nets/mobilenetV3.py:12-15 / nn.Hardsigmoid."""
    return jax.nn.relu6(x + 3.0) / 6.0


def leaky_relu(slope: float) -> Callable:
    return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "hswish": hswish,
    "hsigmoid": hsigmoid,
    "none": lambda x: x,
}


def eca_kernel_size(channels: int, b: int = 1, gamma: int = 2) -> int:
    """Adaptive ECA kernel: k = |log2(C)+b|/gamma rounded up to odd.

    Reference: nets/mobilenetV3.py:335-336.
    """
    k = int(abs((math.log(channels, 2) + b) / gamma))
    return k if k % 2 else k + 1


# ---------------------------------------------------------------------------
# Conv + BN blocks
# ---------------------------------------------------------------------------


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation.

    act: 'relu' | 'hswish' | 'none' or a float leaky-relu slope.
    Mirrors conv_bn / conv_bn1X1 / conv_bn_no_relu (nets/layers.py:10-32).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    act: Any = 0.0  # float slope => LeakyReLU(slope); str => named act
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        # int8 calibration tap (models/quantize.py): a no-op unless the
        # apply marks "quant_calib" mutable — XLA DCEs the reduction in
        # every other graph. (Guarded at init: init() makes every
        # collection mutable and would bake the tap into checkpoints.)
        if not self.is_initializing():
            self.sow("quant_calib", "x_absmax", jnp.max(jnp.abs(x)))
        # Int8-quantized eval graphs (models/quantize.py) replace the
        # conv params with a "qconv" subtree; folded-BN eval graphs
        # (models/fold.py) merge the BatchNorm into the conv kernel + a
        # bias (no "bn" entry). Both are detected at apply time so no
        # flag needs threading through every backbone/neck constructor.
        if not self.is_initializing() and self.has_variable(
            "params", "qconv"
        ):
            from jabd_tpu.models.quantize import qconv_apply

            x = qconv_apply(
                self.get_variable("params", "qconv"),
                x,
                stride=self.stride,
                pad=pad,
                groups=self.groups,
                dtype=self.dtype,
            )
            if isinstance(self.act, str):
                return ACTIVATIONS[self.act](x)
            return jax.nn.leaky_relu(x, negative_slope=float(self.act))
        folded = not self.is_initializing() and not self.has_variable(
            "params", "bn"
        )
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=folded,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not folded:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        if isinstance(self.act, str):
            return ACTIVATIONS[self.act](x)
        # Float act = LeakyReLU(slope). NOTE: slope 0.0 is ReLU, not a
        # no-op — the reference's conv_bn(leaky=0) for out_channel > 64
        # builds nn.LeakyReLU(0) (nets/layers.py:10-15,41-43), which IS
        # ReLU. Use act="none" for genuinely activation-free convs.
        return jax.nn.leaky_relu(x, negative_slope=float(self.act))


# ---------------------------------------------------------------------------
# Channel attention
# ---------------------------------------------------------------------------


def _spatial_mean(x):
    return jnp.mean(x, axis=(1, 2))  # [B, C]


def _spatial_stdv(x):
    """Per-channel spatial standard deviation (the "GAI"/contrast
    statistic) — nets/mobilenetV3.py:350-360. Population variance
    (divide by H*W), sqrt without eps, exactly as the reference.

    Gradient guard: d sqrt/d var is inf at var == 0, and a spatially
    constant channel (e.g. a dead hswish channel, exactly 0 everywhere)
    hits it — autodiff's inf * 0 then NaN-poisons every gradient. The
    where-branch keeps the forward bit-identical (sqrt(0) = 0) while
    the backward of the 0-branch is exactly 0. (The torch reference has
    the same hazard; parity is forward-only.)"""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=(1, 2))
    var_safe = jnp.where(var == 0, 1.0, var)
    return jnp.where(var == 0, 0.0, jnp.sqrt(var_safe))  # [B, C]


class ECA(nn.Module):
    """Efficient channel attention with a 1-D conv across channels.

    statistic: 'avg' (eca_block, nets/mobilenetV3.py:332-348) or
    'stdv' (eca_block_G / contrast ECA, :361-378).
    gate: 'sigmoid' (nets/retinaface_eca_nonlocal.py:217) or 'hsigmoid'
    (nets/mobilenetV3.py:346, train_mobilenetV3_ecagai.py:314).
    """

    statistic: str = "avg"
    gate: str = "hsigmoid"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = eca_kernel_size(c)
        stat = _spatial_stdv(x) if self.statistic == "stdv" else _spatial_mean(x)
        # 1-D conv over the channel axis: [B, C] -> [B, C, 1] "NWC".
        y = nn.Conv(
            1,
            (k,),
            padding=((k // 2, k // 2),),
            use_bias=False,
            dtype=self.dtype,
            name="conv1d",
        )(stat[..., None])[..., 0]
        gate = jax.nn.sigmoid if self.gate == "sigmoid" else hsigmoid
        return x * gate(y)[:, None, None, :]


class SEModule(nn.Module):
    """Squeeze-excite: GAP -> 1x1(bottleneck)+BN+ReLU -> 1x1 -> hsigmoid.

    Reference: nets/mobilenetV3.py:18-32 (expand = max(C // reduction, 8),
    both convs bias-free, BN on the squeezed map).
    """

    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        e = max(c // self.reduction, 8)
        folded = not self.is_initializing() and not self.has_variable(
            "params", "bn"
        )
        y = jnp.mean(x, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        y = nn.Conv(e, (1, 1), use_bias=folded, dtype=self.dtype, name="fc1")(y)
        if not folded:
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(y)
        y = jax.nn.relu(y)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")(y)
        return x * hsigmoid(y)


# ---------------------------------------------------------------------------
# Non-local module with PSP-pooled keys/values (CSAF)
# ---------------------------------------------------------------------------


class PSP(nn.Module):
    """Pyramid spatial pooling to S = sum(s^2) key/value positions.

    Reference: nets/retinaface_eca_nonlocal.py:133-152. Output [B, S, C].
    """

    sizes: Tuple[int, ...] = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, x):
        b, _, _, c = x.shape
        pooled = [
            R.adaptive_avg_pool(x, (s, s)).reshape(b, s * s, c)
            for s in self.sizes
        ]
        return jnp.concatenate(pooled, axis=1)


class NLM(nn.Module):
    """Lightweight non-local attention with PSP-pooled KV.

    q/k/v are 1x1 convs to `ch` dims; keys/values are PSP-pooled to
    S = sum(psp^2) positions, giving attention linear in pixels.
    The output projection W is zero-initialized so the module is the
    identity at init (nets/retinaface_eca_nonlocal.py:168-170).
    Reference forward: :172-200 (scale factor (1 ** -.5) == 1).
    """

    ch: int = 40
    psp_sizes: Tuple[int, ...] = (1, 3, 6, 8)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="f_query")(x)
        k = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="f_key")(x)
        v = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="f_value")(x)
        psp = PSP(self.psp_sizes, name="psp")
        k = psp(k)  # [B, S, ch]
        v = psp(v)  # [B, S, ch]
        q = q.reshape(b, h * w, self.ch)
        # Tiny matmuls (S = sum(psp^2) ~ 110): run them at full precision —
        # negligible cost, keeps parity with the fp32 reference.
        hi = jax.lax.Precision.HIGHEST
        sim = jnp.einsum("bqc,bsc->bqs", q, k, precision=hi)  # scale 1**-.5 == 1
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        ctx = jnp.einsum("bqs,bsc->bqc", attn, v, precision=hi).reshape(
            b, h, w, self.ch
        )
        out = nn.Conv(
            c,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="W",
        )(ctx)
        return out + x


# ---------------------------------------------------------------------------
# SSH context module
# ---------------------------------------------------------------------------


class SSH(nn.Module):
    """3-branch receptive-field module: 3x3 ⊕ 5x5(2×3x3) ⊕ 7x7(3×3x3),
    channel split out/2 + out/4 + out/4, concat + ReLU.

    Reference: nets/layers.py:37-68 (leaky=0.1 iff out_channel <= 64).
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.out_channels % 4 == 0
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        c2, c4 = self.out_channels // 2, self.out_channels // 4
        conv3x3 = ConvBN(c2, 3, act="none", dtype=self.dtype, name="conv3x3")(
            x, train
        )
        c5_1 = ConvBN(c4, 3, act=leaky, dtype=self.dtype, name="conv5x5_1")(
            x, train
        )
        conv5x5 = ConvBN(c4, 3, act="none", dtype=self.dtype, name="conv5x5_2")(
            c5_1, train
        )
        c7_2 = ConvBN(c4, 3, act=leaky, dtype=self.dtype, name="conv7x7_2")(
            c5_1, train
        )
        conv7x7 = ConvBN(c4, 3, act="none", dtype=self.dtype, name="conv7x7_3")(
            c7_2, train
        )
        out = jnp.concatenate([conv3x3, conv5x5, conv7x7], axis=-1)
        return jax.nn.relu(out)


# ---------------------------------------------------------------------------
# FPN
# ---------------------------------------------------------------------------


class PixelShuffleUp(nn.Module):
    """Learned sub-pixel upsample: conv 3x3 -> C*r^2, then depth-to-space.

    The pixelshuffle upsample option sketched in the reference ablation
    grid (train_all_bicubic.py:231-271: conv_layer + nn.PixelShuffle,
    built but commented out of forward). Channel order matches torch
    PixelShuffle: out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j].
    """

    out_channels: int
    factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = self.factor
        y = nn.Conv(
            self.out_channels * r * r,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, self.out_channels, r, r)
        y = y.transpose(0, 1, 4, 2, 5, 3)  # [B, H, r, W, r, C]
        return y.reshape(b, h * r, w * r, self.out_channels)


class FPN(nn.Module):
    """Top-down feature pyramid with optional per-step NLM on the
    upsampled map (the CSAF pathway).

    3-level reference: nets/layers.py:70-119 (nearest) and the flagship
    bicubic+NLM version train_mobilenetV3_ecagai.py:231-285 — the
    'cascade' variant: each level fuses the MERGED map of the level
    below, per-level merge convs.

    4-level reference variants use a different (quirky) wiring with ONE
    shared merge conv (their merge1 is built but dead):
      * 'raw152'   (FPN_152, nets/layers.py:188-245): level1 fuses the
        RAW level-2 lateral; level3 fuses level4; level2 fuses the
        MERGED level3 (the code runs 2->1 before 4->3 before 3->2).
      * 'raw152_5' (FPN_152_5, nets/layers.py:285-326): every level
        fuses the RAW lateral of the level below.

    upsample: 'nearest' | 'bicubic' (align_corners=True) | 'bilinear'
    | 'pixelshuffle' (learned sub-pixel conv, shared across levels like
    the reference's shared nlm; the x2 output is cropped to the target
    grid for odd-sized levels).
    """

    out_channels: int
    upsample: str = "nearest"
    nlm_ch: Optional[int] = None
    nlm_psp: Tuple[int, ...] = (1, 3, 6, 8)
    variant: str = "cascade"  # 'cascade' | 'raw152' | 'raw152_5'
    dtype: Dtype = jnp.float32

    def _up(self, x, like, nlm, pix=None):
        th, tw = like.shape[1], like.shape[2]
        if pix is not None:
            up = pix(x)[:, :th, :tw, :]
            assert up.shape[1] == th and up.shape[2] == tw, (
                f"pixelshuffle x2 {x.shape} cannot reach {like.shape}"
            )
        else:
            up = R.resize(
                x, (th, tw), mode=self.upsample, align_corners=True
            )
        return nlm(up) if nlm is not None else up

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        n = len(inputs)
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        laterals = [
            ConvBN(
                self.out_channels,
                1,
                act=leaky,
                dtype=self.dtype,
                name=f"output{i + 1}",
            )(x, train)
            for i, x in enumerate(inputs)
        ]
        nlm = (
            NLM(self.nlm_ch, self.nlm_psp, dtype=self.dtype, name="nlm")
            if self.nlm_ch is not None
            else None
        )
        pix = (
            PixelShuffleUp(self.out_channels, dtype=self.dtype, name="pix")
            if self.upsample == "pixelshuffle"
            else None
        )

        if self.variant == "cascade":
            outs = [None] * n
            outs[n - 1] = laterals[n - 1]
            for i in range(n - 2, -1, -1):
                up = self._up(outs[i + 1], laterals[i], nlm, pix)
                outs[i] = ConvBN(
                    self.out_channels,
                    3,
                    act=leaky,
                    dtype=self.dtype,
                    name=f"merge{i + 1}",
                )(laterals[i] + up, train)
            return outs

        assert n == 4, f"{self.variant} is the 4-level reference wiring"
        merge = ConvBN(
            self.out_channels, 3, act=leaky, dtype=self.dtype,
            name="merge_shared",
        )
        l1, l2, l3, l4 = laterals
        o1 = merge(l1 + self._up(l2, l1, nlm, pix), train)
        o3 = merge(l3 + self._up(l4, l3, nlm, pix), train)
        if self.variant == "raw152":
            o2 = merge(l2 + self._up(o3, l2, nlm, pix), train)  # merged l3
        elif self.variant == "raw152_5":
            o2 = merge(l2 + self._up(l3, l2, nlm, pix), train)  # raw l3
        else:
            raise ValueError(f"unknown FPN variant {self.variant!r}")
        return [o1, o2, o3, l4]


# ---------------------------------------------------------------------------
# Prediction heads
# ---------------------------------------------------------------------------


class PredictionHead(nn.Module):
    """1x1 conv head -> [B, H*W*A, out_dim].

    NHWC makes the reference's permute(0,2,3,1).view(B,-1,d) a plain
    reshape with identical element order.
    Reference: ClassHead/BboxHead/LandmarkHead/IOUHead
    (nets/retinaface_eca_nonlocal.py:95-132,223-232).
    """

    out_dim: int  # 2 class, 4 bbox, 10 landmark, 1 iou
    num_anchors: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        y = nn.Conv(
            self.num_anchors * self.out_dim,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            name="conv1x1",
        )(x)
        return y.reshape(b, -1, self.out_dim)
