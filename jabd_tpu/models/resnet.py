"""ResNet backbones (Flax, NHWC) with the reference's tap variants.

Reference: nets/resnet_pytorch.py / resnet_pytorch_r.py (vendored
torchvision ResNet) and nets/Resnet.py. Standard bottleneck ResNet-v1
(stride-2 on the 3x3, torchvision style) with:
  * resnet50  [3,4,6,3],  taps layer2/3/4 -> 512/1024/2048 ch
  * resnet101 [3,4,23,3], resnet152 [3,8,36,3]
  * 5-stage "_self" mods (resnet_pytorch.py:179-186,306-352): layer4 at
    256 planes and an extra layer5 at 512 planes; resnet50_self
    [3,4,3,3,3], resnet101_self [3,4,11,12,3], resnet152_self [3,8,18,18,3]
    — taps layer2..5 -> 512/1024/1024/2048 ch.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jabd_tpu.models.layers import ConvBN

Dtype = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4), ReLU after
    each BN, downsample 1x1 conv on the skip when shape changes."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.planes, 1, act="relu", dtype=self.dtype, name="conv1")(
            x, train
        )
        out = ConvBN(
            self.planes,
            3,
            stride=self.stride,
            act="relu",
            dtype=self.dtype,
            name="conv2",
        )(out, train)
        out = ConvBN(
            self.planes * self.expansion,
            1,
            act="none",
            dtype=self.dtype,
            name="conv3",
        )(out, train)
        skip = x
        if self.downsample:
            skip = ConvBN(
                self.planes * self.expansion,
                1,
                stride=self.stride,
                act="none",
                dtype=self.dtype,
                name="downsample",
            )(x, train)
        return jax.nn.relu(out + skip)


# (name, blocks-per-stage, planes-per-stage, tap stage indices)
RESNET_SPECS = {
    "resnet50": ([3, 4, 6, 3], [64, 128, 256, 512], (1, 2, 3)),
    "resnet101": ([3, 4, 23, 3], [64, 128, 256, 512], (1, 2, 3)),
    "resnet152": ([3, 8, 36, 3], [64, 128, 256, 512], (1, 2, 3)),
    # 4-level tap variants (layer1..4, retinaface_152.py via nets/Resnet.py).
    "resnet152_l4": ([3, 8, 36, 3], [64, 128, 256, 512], (0, 1, 2, 3)),
    # 5-stage self mods (resnet_pytorch.py:179-186): layer4 at 256 planes.
    # resnet50_self blocks are [3, 4, 2, 4, 3] (resnet_pytorch.py:316 —
    # the LIVE line; [3,4,3,3,3] is its commented-out predecessor :314).
    "resnet50_self": ([3, 4, 2, 4, 3], [64, 128, 256, 256, 512], (1, 2, 3, 4)),
    "resnet101_self": (
        [3, 4, 11, 12, 3],
        [64, 128, 256, 256, 512],
        (1, 2, 3, 4),
    ),
    "resnet152_self": (
        [3, 8, 18, 18, 3],
        [64, 128, 256, 256, 512],
        (1, 2, 3, 4),
    ),
}


class ResNetBackbone(nn.Module):
    """Stage-tapped ResNet. Returns the feature maps at `taps`."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    planes: Sequence[int] = (64, 128, 256, 512)
    taps: Tuple[int, ...] = (1, 2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(64, 7, stride=2, act="relu", dtype=self.dtype, name="stem")(
            x, train
        )
        # torch MaxPool2d(3, stride=2, padding=1).
        h = jnp.pad(
            h,
            ((0, 0), (1, 1), (1, 1), (0, 0)),
            mode="constant",
            constant_values=-jnp.inf,
        )
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        taps = []
        in_ch = 64
        for si, (nblocks, planes) in enumerate(zip(self.blocks, self.planes)):
            stride = 1 if si == 0 else 2
            for bi in range(nblocks):
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or in_ch != planes * 4)
                h = Bottleneck(
                    planes=planes,
                    stride=s,
                    downsample=down,
                    dtype=self.dtype,
                    name=f"layer{si + 1}_block{bi}",
                )(h, train)
                in_ch = planes * 4
            if si in self.taps:
                taps.append(h)
        return taps


def build_resnet(name: str, dtype=jnp.float32) -> ResNetBackbone:
    blocks, planes, taps = RESNET_SPECS[name]
    return ResNetBackbone(
        blocks=tuple(blocks), planes=tuple(planes), taps=taps, dtype=dtype
    )
