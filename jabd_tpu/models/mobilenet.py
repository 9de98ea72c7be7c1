"""MobileNet backbones (Flax, NHWC).

* MobileNetV1-0.25: nets/mobilenet025.py (3 stages, 64/128/256 ch at
  strides 8/16/32, conv_bn + depthwise conv_dw with LeakyReLU 0.1).
* MobileNetV3-Large family: nets/mobilenetV3.py — the detector taps the
  re-split `layer1/2/3` stages (out 40/80/160 ch). Bottleneck variants:
  Block (:35, optional SE), Block_eca (:94, ECA after the depthwise conv),
  Block_eca_G (:152, contrast/stdv ECA). The `_eca`/`_ecaG`/`_change`
  classes differ only in which block type each stage uses; `_4` re-splits
  into 4 stages for the 4-level pyramid. All of that is data here: a
  backbone = a list of stages, a stage = a list of block specs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jabd_tpu.models.layers import ConvBN, ECA, SEModule, hswish

Dtype = Any


# ---------------------------------------------------------------------------
# MobileNetV3 bottleneck
# ---------------------------------------------------------------------------


class MNV3Block(nn.Module):
    """MobileNetV3 bottleneck: expand 1x1 -> depthwise kxk -> [SE] [ECA]
    -> project 1x1, plus a conv-skip and a *post-sum activation* — the
    reference applies act3 after the residual add (nets/mobilenetV3.py:91),
    a quirk kept for parity.

    Skip path rules (nets/mobilenetV3.py:58-79):
      stride 1, in != out: 1x1 conv + BN
      stride 2, in != out: depthwise 3x3 s2 + BN + 1x1(bias) + BN
      stride 2, in == out: depthwise 3x3 s2 + BN
      stride 1, in == out: identity
    """

    kernel: int
    in_size: int
    expand: int
    out: int
    act: str  # 'relu' | 'hswish'
    se: bool
    stride: int
    eca: Optional[str] = None  # None | 'avg' | 'stdv'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = jax.nn.relu if self.act == "relu" else hswish
        h = ConvBN(self.expand, 1, act="none", dtype=self.dtype, name="conv1")(
            x, train
        )
        h = act(h)
        h = ConvBN(
            self.expand,
            self.kernel,
            stride=self.stride,
            groups=self.expand,
            act="none",
            dtype=self.dtype,
            name="conv2",
        )(h, train)
        h = act(h)
        # Block_eca/_eca_G construct an SE module but never call it in
        # forward (nets/mobilenetV3.py:140-150,198-208): ECA replaces SE.
        if self.eca is not None:
            h = ECA(
                statistic=self.eca, gate="hsigmoid", dtype=self.dtype,
                name="eca",
            )(h)
        elif self.se:
            h = SEModule(dtype=self.dtype, name="se")(h, train)
        h = ConvBN(self.out, 1, act="none", dtype=self.dtype, name="conv3")(
            h, train
        )

        skip = x
        if self.stride == 1 and self.in_size != self.out:
            skip = ConvBN(
                self.out, 1, act="none", dtype=self.dtype, name="skip_conv"
            )(x, train)
        elif self.stride == 2 and self.in_size != self.out:
            skip = ConvBN(
                self.in_size,
                3,
                stride=2,
                groups=self.in_size,
                act="none",
                dtype=self.dtype,
                name="skip_dw",
            )(x, train)
            # Reference uses bias=True on this 1x1 (nets/mobilenetV3.py:70).
            skip = nn.Conv(
                self.out, (1, 1), use_bias=True, dtype=self.dtype,
                name="skip_pw",
            )(skip)
            # Folded eval graphs (models/fold.py) merge this BN into
            # skip_pw's kernel/bias and drop the "skip_pw_bn" params.
            if self.is_initializing() or self.has_variable(
                "params", "skip_pw_bn"
            ):
                skip = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name="skip_pw_bn",
                )(skip)
        elif self.stride == 2 and self.in_size == self.out:
            skip = ConvBN(
                self.out,
                3,
                stride=2,
                groups=self.in_size,
                act="none",
                dtype=self.dtype,
                name="skip_dw",
            )(x, train)

        return act(h + skip)


# Block spec: (kernel, in, expand, out, act, se, stride)
_L_STAGE1 = [
    (3, 16, 16, 16, "relu", False, 1),
    (3, 16, 64, 24, "relu", False, 2),
    (3, 24, 72, 24, "relu", False, 1),
    (5, 24, 72, 40, "relu", True, 2),
    (5, 40, 120, 40, "relu", True, 1),
    (5, 40, 120, 40, "relu", True, 1),
]
_L_STAGE2 = [
    (3, 40, 240, 80, "hswish", False, 2),
    (3, 80, 200, 80, "hswish", False, 1),
    (3, 80, 184, 80, "hswish", False, 1),
    (3, 80, 184, 80, "hswish", False, 1),
]
_L_STAGE3 = [
    (3, 80, 480, 112, "hswish", True, 1),
    (3, 112, 672, 112, "hswish", True, 1),
    (5, 112, 672, 160, "hswish", True, 2),
    (5, 160, 672, 160, "hswish", True, 1),
    (5, 160, 960, 160, "hswish", True, 1),
]

# 3-stage split used by _eca/_ecaG/_change (nets/mobilenetV3.py:387-409,
# 459-481, 531-553): taps at 40 / 80 / 160 channels.
MNV3_LARGE_3STAGE = [_L_STAGE1, _L_STAGE2, _L_STAGE3]

# 4-stage split of MobileNetV3_Large_4 (nets/mobilenetV3.py:604-627):
# taps at 40 / 80 / 80 / 160 channels.
MNV3_LARGE_4STAGE = [
    _L_STAGE1[:4],
    [_L_STAGE1[4], _L_STAGE1[5], _L_STAGE2[0]],
    _L_STAGE2[1:],
    _L_STAGE3,
]


class MobileNetV3Backbone(nn.Module):
    """Stage-split MobileNetV3-Large feature extractor.

    stem: conv 3x3 s2 -> 16ch + BN + hswish (nets/mobilenetV3.py:455-457).
    Returns one feature map per stage (the IntermediateLayerGetter taps).

    block_attention: None -> Block; 'eca' -> Block_eca everywhere
    (MobileNetV3_Large_eca); 'eca_g' -> the Block_eca/Block_eca_G mix of
    MobileNetV3_Large_ecaG (nets/mobilenetV3.py:387-409: stdv-ECA in
    stage-1 block 3 and stage-2 block 2, avg-ECA elsewhere).
    """

    stages: Sequence[Sequence[Tuple]] = tuple(
        tuple(s) for s in MNV3_LARGE_3STAGE
    )
    block_attention: Optional[str] = None
    dtype: Dtype = jnp.float32

    # (stage, block) indices that use stdv-ECA under 'eca_g'.
    _ECAG_BLOCKS = ((0, 3), (1, 2))

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(16, 3, stride=2, act="none", dtype=self.dtype, name="stem")(
            x, train
        )
        h = hswish(h)
        taps = []
        for si, stage in enumerate(self.stages):
            for bi, (k, cin, exp, cout, act, se, stride) in enumerate(stage):
                eca = None
                if self.block_attention == "eca":
                    eca = "avg"
                elif self.block_attention == "eca_g":
                    eca = (
                        "stdv" if (si, bi) in self._ECAG_BLOCKS else "avg"
                    )
                h = MNV3Block(
                    kernel=k,
                    in_size=cin,
                    expand=exp,
                    out=cout,
                    act=act,
                    se=se,
                    stride=stride,
                    eca=eca,
                    dtype=self.dtype,
                    name=f"layer{si + 1}_block{bi}",
                )(h, train)
            taps.append(h)
        return taps


# ---------------------------------------------------------------------------
# MobileNetV1-0.25
# ---------------------------------------------------------------------------


class MobileNetV1Backbone(nn.Module):
    """MobileNetV1 x0.25: 3 stages -> 64/128/256 ch at strides 8/16/32.

    Reference: nets/mobilenet025.py:21-56 (conv_bn stem + conv_dw chains,
    LeakyReLU 0.1 everywhere).
    """

    dtype: Dtype = jnp.float32

    def _dw(self, h, cout, stride, i, train):
        h = ConvBN(
            h.shape[-1],
            3,
            stride=stride,
            groups=h.shape[-1],
            act=0.1,
            dtype=self.dtype,
            name=f"dw{i}_depth",
        )(h, train)
        return ConvBN(
            cout, 1, act=0.1, dtype=self.dtype, name=f"dw{i}_point"
        )(h, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(8, 3, stride=2, act=0.1, dtype=self.dtype, name="stem")(
            x, train
        )
        # stage1: 8->16, 16->32 s2, 32->32, 32->64 s2, 64->64
        plan1 = [(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]
        for i, (c, s) in enumerate(plan1):
            h = self._dw(h, c, s, i, train)
        t1 = h
        # stage2: 64->128 s2 + 5x 128
        plan2 = [(128, 2)] + [(128, 1)] * 5
        for i, (c, s) in enumerate(plan2):
            h = self._dw(h, c, s, i + len(plan1), train)
        t2 = h
        # stage3: 128->256 s2, 256->256
        plan3 = [(256, 2), (256, 1)]
        for i, (c, s) in enumerate(plan3):
            h = self._dw(h, c, s, i + len(plan1) + len(plan2), train)
        return [t1, t2, h]
