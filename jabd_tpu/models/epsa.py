"""EPSANet-50: pyramid-split-attention ResNet alternative backbone.

Reference: nets/EPSA50.py — SEWeightModule (:5), PSAModule (:32:
4-way channel split through 3/5/7/9 grouped convs, per-split SE weights
softmax-normalized ACROSS the splits, note the reference's reversed
concat order in the recombine loop :61-66), EPSABlock (:77), EPSANet
(:118: 5 stages 64/128/256/256/512 planes like the resnet _self mods,
taps layer2..5). Only referenced (commented out) by retinaface50_self.py
in the reference; provided here for inventory completeness.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jabd_tpu.models.layers import ConvBN

Dtype = Any


class SEWeight(nn.Module):
    """SE weights WITH biases (nets/EPSA50.py:10-12 convs default bias)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(c // self.reduction, (1, 1), dtype=self.dtype,
                    name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(y)
        return jax.nn.sigmoid(y)  # [B, 1, 1, C]


class PSAModule(nn.Module):
    planes: int
    stride: int = 1
    conv_kernels: Tuple[int, ...] = (3, 5, 7, 9)
    conv_groups: Tuple[int, ...] = (1, 4, 8, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        split = self.planes // 4
        feats = []
        for i, (k, g) in enumerate(zip(self.conv_kernels, self.conv_groups)):
            pad = k // 2
            feats.append(
                nn.Conv(
                    split,
                    (k, k),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=g,
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"conv_{i + 1}",
                )(x)
            )
        se = SEWeight(dtype=self.dtype, name="se")  # shared across splits
        weights = jnp.stack([se(f) for f in feats], axis=1)  # [B,4,1,1,C/4]
        weights = jax.nn.softmax(weights, axis=1)
        stacked = jnp.stack(feats, axis=1)  # [B, 4, H, W, C/4]
        weighted = stacked * weights
        # Reference recombines in REVERSED split order (EPSA50.py:61-66:
        # out = cat(x_i, out) prepends each split).
        parts = [weighted[:, i] for i in range(3, -1, -1)]
        return jnp.concatenate(parts, axis=-1)


class EPSABlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.planes, 1, act="relu", dtype=self.dtype,
                     name="conv1")(x, train)
        out = PSAModule(self.planes, stride=self.stride, dtype=self.dtype,
                        name="psa")(out, train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        out = jax.nn.relu(out)
        out = ConvBN(self.planes * self.expansion, 1, act="none",
                     dtype=self.dtype, name="conv3")(out, train)
        skip = x
        if self.downsample:
            skip = ConvBN(
                self.planes * self.expansion, 1, stride=self.stride,
                act="none", dtype=self.dtype, name="downsample",
            )(x, train)
        return jax.nn.relu(out + skip)


class EPSANetBackbone(nn.Module):
    """5-stage EPSANet-50 ([3, 4, 2, 4, 3] with 64/128/256/256/512
    planes — epsanet50, nets/EPSA50.py:177-179), taps layer2..5 like
    resnet50_self (nets/EPSA50.py:118-130)."""

    blocks: Sequence[int] = (3, 4, 2, 4, 3)
    planes: Sequence[int] = (64, 128, 256, 256, 512)
    taps: Tuple[int, ...] = (1, 2, 3, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(64, 7, stride=2, act="relu", dtype=self.dtype,
                   name="stem")(x, train)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        taps = []
        in_ch = 64
        for si, (n, p) in enumerate(zip(self.blocks, self.planes)):
            stride = 1 if si == 0 else 2
            for bi in range(n):
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or in_ch != p * 4)
                h = EPSABlock(planes=p, stride=s, downsample=down,
                              dtype=self.dtype,
                              name=f"layer{si + 1}_block{bi}")(h, train)
                in_ch = p * 4
            if si in self.taps:
                taps.append(h)
        return taps
