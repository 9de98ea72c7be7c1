"""Converter parity for the ResNet detector backbone and the IR
recognition backbone, against in-test torch goldens that reproduce the
reference naming/structure (resnet_pytorch.py torchvision copy;
net.py:140-332)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # compile-heavy module

import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jabd_tpu.models.resnet import ResNetBackbone  # noqa: E402
from jabd_tpu.recognition.net import IRBackbone  # noqa: E402
from jabd_tpu.recognition.torch_convert import convert_ir_state_dict  # noqa: E402
from jabd_tpu.utils.torch_convert import (  # noqa: E402
    convert_resnet_detector_state_dict,
)


def _randomize_bn(model, seed=1):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.1
            m.running_var = torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75


# --- torch golden: torchvision-style bottleneck resnet body ---------------


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = self.downsample(x) if self.downsample else x
        return self.relu(out + identity)


class TResNetBody(nn.Module):
    """conv1/bn1/maxpool + layer1..4, taps layer2/3/4 — the
    IntermediateLayerGetter'd torchvision resnet (resnet_pytorch.py)."""

    def __init__(self, layers=(2, 2, 2, 2)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        for i, (planes, n) in enumerate(
            zip((64, 128, 256, 512), layers)
        ):
            stride = 1 if i == 0 else 2
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                down = None
                if b == 0 and (s != 1 or self.inplanes != planes * 4):
                    down = nn.Sequential(
                        nn.Conv2d(self.inplanes, planes * 4, 1, s,
                                  bias=False),
                        nn.BatchNorm2d(planes * 4),
                    )
                blocks.append(TBottleneck(self.inplanes, planes, s, down))
                self.inplanes = planes * 4
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        t1 = self.layer2(x)
        t2 = self.layer3(t1)
        t3 = self.layer4(t2)
        return t1, t2, t3


def test_resnet_body_conversion_parity(rng):
    torch.manual_seed(0)
    tbody = TResNetBody(layers=(2, 2, 2, 2)).eval()
    _randomize_bn(tbody)
    sd = {
        "body." + k: v.detach().numpy() for k, v in tbody.state_dict().items()
    }

    import dataclasses

    from jabd_tpu import configs

    # A reduced-depth "resnet50-shaped" config for test speed.
    cfg = dataclasses.replace(
        configs.get_model_config("re50_baseline"), compute_dtype="float32"
    )
    from jabd_tpu.models import resnet as RN

    RN_test = dict(RN.RESNET_SPECS)
    RN_test["resnet50"] = ([2, 2, 2, 2], [64, 128, 256, 512], (1, 2, 3))
    old = RN.RESNET_SPECS["resnet50"]
    RN.RESNET_SPECS["resnet50"] = RN_test["resnet50"]
    try:
        params, stats = convert_resnet_detector_state_dict(sd, cfg)
        backbone = ResNetBackbone(
            blocks=(2, 2, 2, 2), planes=(64, 128, 256, 512), taps=(1, 2, 3)
        )
        x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t1, t2, t3 = tbody(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            )
        j1, j2, j3 = jax.jit(
            lambda v, i: backbone.apply(v, i, train=False)
        )(
            {"params": params["backbone"], "batch_stats": stats["backbone"]},
            jnp.asarray(x),
        )
        for tv, jv in [(t1, j1), (t2, j2), (t3, j3)]:
            np.testing.assert_allclose(
                np.asarray(jv),
                np.transpose(tv.numpy(), (0, 2, 3, 1)),
                rtol=5e-3,
                atol=5e-4,
            )
    finally:
        RN.RESNET_SPECS["resnet50"] = old


# --- torch golden: IR-18 recognition backbone ------------------------------


class TBasicBlockIR(nn.Module):
    def __init__(self, in_channel, depth, stride):
        super().__init__()
        if in_channel == depth:
            self.shortcut_layer = nn.MaxPool2d(1, stride)
        else:
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(in_channel, depth, 1, stride, bias=False),
                nn.BatchNorm2d(depth),
            )
        self.res_layer = nn.Sequential(
            nn.BatchNorm2d(in_channel),
            nn.Conv2d(in_channel, depth, 3, 1, 1, bias=False),
            nn.BatchNorm2d(depth),
            nn.PReLU(depth),
            nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
            nn.BatchNorm2d(depth),
        )

    def forward(self, x):
        return self.res_layer(x) + self.shortcut_layer(x)


class TIR18(nn.Module):
    def __init__(self):
        super().__init__()
        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False),
            nn.BatchNorm2d(64),
            nn.PReLU(64),
        )
        blocks = []
        in_c = 64
        for depth, units in [(64, 2), (128, 2), (256, 2), (512, 2)]:
            for b in range(units):
                blocks.append(
                    TBasicBlockIR(in_c, depth, 2 if b == 0 else 1)
                )
                in_c = depth
        self.body = nn.Sequential(*blocks)
        self.output_layer = nn.Sequential(
            nn.BatchNorm2d(512),
            nn.Dropout(0.4),
            nn.Flatten(),
            nn.Linear(512 * 7 * 7, 512),
            nn.BatchNorm1d(512, affine=False),
        )

    def forward(self, x):
        x = self.input_layer(x)
        x = self.body(x)
        x = self.output_layer(x)
        norm = torch.norm(x, 2, 1, True)
        return x / norm, norm


def test_ir18_conversion_parity(rng):
    torch.manual_seed(0)
    tmodel = TIR18().eval()
    _randomize_bn(tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_ir_state_dict(sd, num_layers=18, mode="ir")

    model = IRBackbone(num_layers=18, mode="ir")
    x = rng.normal(0, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        temb, tnorm = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    jemb, jnorm = jax.jit(lambda v, i: model.apply(v, i, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(jemb), temb.numpy(), rtol=5e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(jnorm), tnorm.numpy(), rtol=5e-3, atol=5e-3
    )
