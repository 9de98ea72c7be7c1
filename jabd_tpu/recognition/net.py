"""IR / IR-SE embedding backbones (Flax, NHWC).

Reference: net.py — `BasicBlockIR` (:140), `BottleneckIR` (:166),
SE variants (:197-206), `Backbone` (:267: 112x112 input, 512-d embedding,
returns (l2-normalized embedding, norm) :319-332), constructors
IR_18..IR_SE_200 (:336-413).

Structure notes kept for checkpoint-conversion parity:
  * residual branch = BN -> conv3x3 -> BN -> PReLU(C) -> conv3x3(stride)
    -> BN (basic) — BN-first "IR" ordering;
  * identity shortcut uses MaxPool2d(1, stride) (a strided slice);
  * output layer = BN2d -> Dropout(0.4) -> Flatten -> Linear(512) ->
    BatchNorm1d(512, affine=False); the flatten follows torch's CHW
    order so converted Linear weights line up.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C), init 0.25)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda _, s: jnp.full(s, 0.25, jnp.float32),
            (x.shape[-1],),
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def _bn(name, train, dtype):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def _conv(mod, name, x, features, kernel=3, stride=1, dtype=jnp.float32):
    """nn.Conv with fold/int8 awareness (recognition twin of
    models/layers.py::ConvBN's detection pattern):

      * sows the input absmax for int8 calibration (dead code unless the
        "quant_calib" collection is mutable);
      * a param dict holding "kernel_q" (models/quantize.py) runs the
        int8 MXU path;
      * a param dict holding "bias" is a folded conv+BN (fold_ir).
    """
    if not mod.is_initializing():
        mod.sow("quant_calib", f"{name}_absmax", jnp.max(jnp.abs(x)))
        p = (
            mod.get_variable("params", name)
            if mod.has_variable("params", name)
            else None
        )
        if p is not None and "kernel_q" in p:
            from jabd_tpu.models.quantize import qconv_apply

            return qconv_apply(
                p, x, stride=stride, pad=kernel // 2, groups=1,
                dtype=dtype,
            )
        use_bias = p is not None and "bias" in p
    else:
        use_bias = False
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )(x)


def _maybe_bn(mod, name, x, train, dtype):
    """BatchNorm unless fold_ir removed it from the tree."""
    if not mod.is_initializing() and not (
        mod.has_variable("batch_stats", name)
        or mod.has_variable("params", name)
    ):
        return x
    return _bn(name, train, dtype)(x)


class SEBlock(nn.Module):
    """SE with reduction 16, sigmoid gate, bias-free convs (net.py:113-138)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(c // self.reduction, (1, 1), use_bias=False,
                    dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc2")(y)
        return x * jax.nn.sigmoid(y)


def _shortcut(mod, x, depth, stride, train, dtype, name):
    cin = x.shape[-1]
    if cin == depth:
        # MaxPool2d(1, stride) == strided slice.
        return x[:, ::stride, ::stride, :]
    h = _conv(
        mod, f"{name}_conv", x, depth, kernel=1, stride=stride,
        dtype=dtype,
    )
    return _maybe_bn(mod, f"{name}_bn", h, train, dtype)


class BasicBlockIR(nn.Module):
    depth: int
    stride: int
    se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = _bn("bn0", train, self.dtype)(x)
        res = _conv(self, "conv1", res, self.depth, dtype=self.dtype)
        res = _maybe_bn(self, "bn1", res, train, self.dtype)
        res = PReLU(name="prelu")(res)
        res = _conv(
            self, "conv2", res, self.depth, stride=self.stride,
            dtype=self.dtype,
        )
        res = _maybe_bn(self, "bn2", res, train, self.dtype)
        if self.se:
            res = SEBlock(dtype=self.dtype, name="se")(res)
        return res + _shortcut(self, x, self.depth, self.stride, train,
                               self.dtype, "shortcut")


class BottleneckIRBlock(nn.Module):
    """BottleneckIR (net.py:166-194): reduction = depth // 4; the stride
    sits on the LAST 1x1 conv (reference quirk)."""

    depth: int
    stride: int
    se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        red = self.depth // 4
        res = _bn("bn0", train, self.dtype)(x)
        res = _conv(self, "conv1", res, red, kernel=1, dtype=self.dtype)
        res = _maybe_bn(self, "bn1", res, train, self.dtype)
        res = PReLU(name="prelu1")(res)
        res = _conv(self, "conv2", res, red, dtype=self.dtype)
        res = _maybe_bn(self, "bn2", res, train, self.dtype)
        res = PReLU(name="prelu2")(res)
        res = _conv(
            self, "conv3", res, self.depth, kernel=1,
            stride=self.stride, dtype=self.dtype,
        )
        res = _maybe_bn(self, "bn3", res, train, self.dtype)
        if self.se:
            res = SEBlock(dtype=self.dtype, name="se")(res)
        return res + _shortcut(self, x, self.depth, self.stride, train,
                               self.dtype, "shortcut")


# (depth, num_units) per stage — net.py:219-264 get_blocks.
IR_STAGES = {
    18: [(64, 2), (128, 2), (256, 2), (512, 2)],
    34: [(64, 3), (128, 4), (256, 6), (512, 3)],
    50: [(64, 3), (128, 4), (256, 14), (512, 3)],
    100: [(64, 3), (128, 13), (256, 30), (512, 3)],
    152: [(256, 3), (512, 8), (1024, 36), (2048, 3)],
    200: [(256, 3), (512, 24), (1024, 36), (2048, 3)],
}


class IRBackbone(nn.Module):
    """112x112 -> (l2-normalized 512-d embedding, norm)."""

    num_layers: int = 50
    mode: str = "ir"  # 'ir' | 'ir_se'
    embedding_size: int = 512
    dropout: float = 0.4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.num_layers in IR_STAGES
        se = self.mode == "ir_se"
        block_cls = (
            BottleneckIRBlock if self.num_layers > 100 else BasicBlockIR
        )
        h = _conv(self, "input_conv", x, 64, dtype=self.dtype)
        h = _maybe_bn(self, "input_bn", h, train, self.dtype)
        h = PReLU(name="input_prelu")(h)
        for si, (depth, units) in enumerate(IR_STAGES[self.num_layers]):
            for bi in range(units):
                h = block_cls(
                    depth=depth,
                    stride=2 if bi == 0 else 1,
                    se=se,
                    dtype=self.dtype,
                    name=f"stage{si + 1}_block{bi}",
                )(h, train)
        h = _bn("output_bn", train, self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        # Flatten in torch CHW order for converted-weight compatibility.
        b = h.shape[0]
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)
        # fold_ir merges features_bn (an affine-free normalize) into this
        # projection's kernel columns + bias and removes its stats; the
        # int8 path (kernel_q) runs it as an int8 MXU matmul.
        if not self.is_initializing():
            self.sow("quant_calib", "fc_absmax", jnp.max(jnp.abs(h)))
        fc_p = (
            self.get_variable("params", "fc")
            if not self.is_initializing()
            and self.has_variable("params", "fc")
            else None
        )
        if fc_p is not None and "kernel_q" in fc_p:
            from jabd_tpu.models.quantize import qdense_apply

            h = qdense_apply(fc_p, h, self.dtype)
        else:
            h = nn.Dense(
                self.embedding_size, dtype=self.dtype, name="fc"
            )(h)
        if self.is_initializing() or self.has_variable(
            "batch_stats", "features_bn"
        ):
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                use_scale=False,
                use_bias=False,
                dtype=self.dtype,
                name="features_bn",
            )(h)
        h = h.astype(jnp.float32)
        norm = jnp.linalg.norm(h, axis=1, keepdims=True)
        return h / norm, norm


def build_model(name: str = "ir_50", dtype=jnp.float32) -> IRBackbone:
    """net.py:14-26 name registry, extended with the deeper variants."""
    table = {
        "ir_18": (18, "ir"),
        "ir_34": (34, "ir"),
        "ir_50": (50, "ir"),
        "ir_101": (100, "ir"),  # "ir_101" uses the 100-layer stages
        "ir_152": (152, "ir"),
        "ir_200": (200, "ir"),
        "ir_se_18": (18, "ir_se"),
        "ir_se_34": (34, "ir_se"),
        "ir_se_50": (50, "ir_se"),
        "ir_se_101": (100, "ir_se"),
        "ir_se_152": (152, "ir_se"),
        "ir_se_200": (200, "ir_se"),
    }
    if name not in table:
        raise ValueError(f"not a correct model name {name!r}")
    layers, mode = table[name]
    return IRBackbone(num_layers=layers, mode=mode, dtype=dtype)
