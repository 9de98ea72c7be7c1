"""End-to-end numerical parity vs a PyTorch golden of the flagship JABD
model (BASELINE config #1: single-image CPU parity, detections IoU>=0.99).

The golden below re-states the reference formulas in torch
(train_mobilenetV3_ecagai.py:319-435 inline RetinaFace with
MobileNetV3_Large_eca from nets/mobilenetV3.py:452-522) with the SAME
state-dict names, random-initializes it, converts the weights with
jabd_tpu.utils.torch_convert, and compares full forward outputs and
decoded-box IoU.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # compile-heavy module

import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jabd_tpu import configs  # noqa: E402
from jabd_tpu.models import build_model  # noqa: E402
from jabd_tpu.ops import anchors as A  # noqa: E402
from jabd_tpu.ops import boxes as B  # noqa: E402
from jabd_tpu.utils import torch_convert as TC  # noqa: E402


# ---- torch golden (reference formulas, reference state-dict names) --------


def _stdv_channels(x):
    mean = x.mean(dim=(2, 3), keepdim=True)
    var = ((x - mean) ** 2).mean(dim=(2, 3), keepdim=True)
    return var.sqrt()


class TEcaStdv(nn.Module):
    """Contrast ECA, hsigmoid gate (train_mobilenetV3_ecagai.py:299-316)."""

    def __init__(self, channel, b=1, gamma=2):
        super().__init__()
        k = int(abs((math.log(channel, 2) + b) / gamma))
        k = k if k % 2 else k + 1
        self.conv = nn.Conv1d(1, 1, kernel_size=k, padding=(k - 1) // 2,
                              bias=False)

    def forward(self, x):
        y = _stdv_channels(x)
        y = self.conv(y.squeeze(-1).transpose(-1, -2)).transpose(-1, -2)
        y = y.unsqueeze(-1)
        y = F.relu6(y + 3) / 6
        return x * y.expand_as(x)


class TEcaAvg(nn.Module):
    """Avg ECA, hsigmoid gate (nets/mobilenetV3.py:332-348)."""

    def __init__(self, channel, b=1, gamma=2):
        super().__init__()
        k = int(abs((math.log(channel, 2) + b) / gamma))
        k = k if k % 2 else k + 1
        self.conv = nn.Conv1d(1, 1, kernel_size=k, padding=(k - 1) // 2,
                              bias=False)

    def forward(self, x):
        y = F.adaptive_avg_pool2d(x, 1)
        y = self.conv(y.squeeze(-1).transpose(-1, -2)).transpose(-1, -2)
        y = y.unsqueeze(-1)
        y = F.relu6(y + 3) / 6
        return x * y.expand_as(x)


def _hswish(x):
    return x * F.relu6(x + 3) / 6


class TBlockEca(nn.Module):
    """Block_eca (nets/mobilenetV3.py:94-150): SE constructed but unused."""

    def __init__(self, kernel, cin, exp, cout, act, stride):
        super().__init__()
        self.act_name = act
        self.conv1 = nn.Conv2d(cin, exp, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(exp)
        self.conv2 = nn.Conv2d(exp, exp, kernel, stride, kernel // 2,
                               groups=exp, bias=False)
        self.bn2 = nn.BatchNorm2d(exp)
        self.eca = TEcaAvg(exp)
        self.conv3 = nn.Conv2d(exp, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.skip = None
        if stride == 1 and cin != cout:
            self.skip = nn.Sequential(
                nn.Conv2d(cin, cout, 1, bias=False), nn.BatchNorm2d(cout)
            )
        if stride == 2 and cin != cout:
            self.skip = nn.Sequential(
                nn.Conv2d(cin, cin, 3, 2, 1, groups=cin, bias=False),
                nn.BatchNorm2d(cin),
                nn.Conv2d(cin, cout, 1, bias=True),
                nn.BatchNorm2d(cout),
            )
        if stride == 2 and cin == cout:
            self.skip = nn.Sequential(
                nn.Conv2d(cin, cout, 3, 2, 1, groups=cin, bias=False),
                nn.BatchNorm2d(cout),
            )

    def act(self, x):
        return F.relu(x) if self.act_name == "relu" else _hswish(x)

    def forward(self, x):
        out = self.act(self.bn1(self.conv1(x)))
        out = self.act(self.bn2(self.conv2(out)))
        out = self.eca(out)
        out = self.bn3(self.conv3(out))
        skip = self.skip(x) if self.skip is not None else x
        return self.act(out + skip)


class TBody(nn.Module):
    """MobileNetV3_Large_eca through IntermediateLayerGetter
    (nets/mobilenetV3.py:452-522, taps layer1/2/3)."""

    def __init__(self):
        super().__init__()
        from jabd_tpu.models.mobilenet import MNV3_LARGE_3STAGE

        self.conv1 = nn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(16)
        for si, stage in enumerate(MNV3_LARGE_3STAGE):
            blocks = [
                TBlockEca(k, cin, exp, cout, act, stride)
                for (k, cin, exp, cout, act, se, stride) in stage
            ]
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        out = _hswish(self.bn1(self.conv1(x)))
        t1 = self.layer1(out)
        t2 = self.layer2(t1)
        t3 = self.layer3(t2)
        return [t1, t2, t3]


class TNLM(nn.Module):
    """NLM ch=40 psp (1,3,6,8) (train_mobilenetV3_ecagai.py:183-228)."""

    def __init__(self, in_channels, ch=40, psp=(1, 3, 6, 8)):
        super().__init__()
        self.ch = ch
        self.psp_sizes = psp
        self.f_query = nn.Conv2d(in_channels, ch, 1)
        self.f_key = nn.Conv2d(in_channels, ch, 1)
        self.f_value = nn.Conv2d(in_channels, ch, 1)
        self.W = nn.Conv2d(ch, in_channels, 1)

    def psp(self, x):
        n, c = x.shape[:2]
        outs = [
            F.adaptive_avg_pool2d(x, s).view(n, c, -1) for s in self.psp_sizes
        ]
        return torch.cat(outs, -1)

    def forward(self, x):
        b, _, h, w = x.shape
        q = self.f_query(x).view(b, self.ch, -1).permute(0, 2, 1)
        k = self.psp(self.f_key(x))
        v = self.psp(self.f_value(x)).permute(0, 2, 1)
        sim = torch.matmul(q, k)
        sim = F.softmax(sim, dim=-1)
        ctx = torch.matmul(sim, v).permute(0, 2, 1).contiguous()
        ctx = ctx.view(b, self.ch, h, w)
        return self.W(ctx) + x


def _conv_bn(inp, oup, k, stride, leaky):
    return nn.Sequential(
        nn.Conv2d(inp, oup, k, stride, k // 2, bias=False),
        nn.BatchNorm2d(oup),
        nn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


def _conv_bn_no_relu(inp, oup, k=3):
    return nn.Sequential(
        nn.Conv2d(inp, oup, k, 1, k // 2, bias=False), nn.BatchNorm2d(oup)
    )


class TFPN(nn.Module):
    """Flagship FPN: bicubic align_corners upsample + shared NLM
    (train_mobilenetV3_ecagai.py:231-285)."""

    def __init__(self, in_list, out):
        super().__init__()
        leaky = 0.1 if out <= 64 else 0.0
        self.output1 = _conv_bn(in_list[0], out, 1, 1, leaky)
        self.output2 = _conv_bn(in_list[1], out, 1, 1, leaky)
        self.output3 = _conv_bn(in_list[2], out, 1, 1, leaky)
        self.merge1 = _conv_bn(out, out, 3, 1, leaky)
        self.merge2 = _conv_bn(out, out, 3, 1, leaky)
        self.nlm = TNLM(out)

    def forward(self, inputs):
        o1 = self.output1(inputs[0])
        o2 = self.output2(inputs[1])
        o3 = self.output3(inputs[2])
        up3 = F.interpolate(o3, size=o2.shape[2:], mode="bicubic",
                            align_corners=True)
        o2 = self.merge2(o2 + self.nlm(up3))
        up2 = F.interpolate(o2, size=o1.shape[2:], mode="bicubic",
                            align_corners=True)
        o1 = self.merge1(o1 + self.nlm(up2))
        return [o1, o2, o3]


class TSSH(nn.Module):
    """nets/layers.py:37-68."""

    def __init__(self, inp, out):
        super().__init__()
        leaky = 0.1 if out <= 64 else 0.0
        self.conv3X3 = _conv_bn_no_relu(inp, out // 2)
        self.conv5X5_1 = _conv_bn(inp, out // 4, 3, 1, leaky)
        self.conv5X5_2 = _conv_bn_no_relu(out // 4, out // 4)
        self.conv7X7_2 = _conv_bn(out // 4, out // 4, 3, 1, leaky)
        self.conv7x7_3 = _conv_bn_no_relu(out // 4, out // 4)

    def forward(self, x):
        c3 = self.conv3X3(x)
        c5_1 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(c5_1)
        c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
        return F.relu(torch.cat([c3, c5, c7], dim=1))


class THead(nn.Module):
    def __init__(self, inch, d, a=2):
        super().__init__()
        self.d = d
        self.conv1x1 = nn.Conv2d(inch, a * d, 1)

    def forward(self, x):
        out = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
        return out.view(out.shape[0], -1, self.d)


class TFlagship(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = TBody()
        self.eca_40 = TEcaStdv(40)
        self.eca_80 = TEcaStdv(80)
        self.eca_160 = TEcaStdv(160)
        self.fpn = TFPN([40, 80, 160], 40)
        self.eca_fpn = TEcaStdv(40)
        self.ssh1 = TSSH(40, 40)
        self.ssh2 = TSSH(40, 40)
        self.ssh3 = TSSH(40, 40)
        self.ClassHead = nn.ModuleList([THead(40, 2) for _ in range(3)])
        self.BboxHead = nn.ModuleList([THead(40, 4) for _ in range(3)])
        self.LandmarkHead = nn.ModuleList([THead(40, 10) for _ in range(3)])

    def forward(self, x):
        t1, t2, t3 = self.body(x)
        out = [self.eca_40(t1), self.eca_80(t2), self.eca_160(t3)]
        fpn = self.fpn(out)
        feats = [
            self.ssh1(self.eca_fpn(fpn[0])),
            self.ssh2(self.eca_fpn(fpn[1])),
            self.ssh3(self.eca_fpn(fpn[2])),
        ]
        bbox = torch.cat([self.BboxHead[i](f) for i, f in enumerate(feats)], 1)
        cls = torch.cat([self.ClassHead[i](f) for i, f in enumerate(feats)], 1)
        ldm = torch.cat(
            [self.LandmarkHead[i](f) for i, f in enumerate(feats)], 1
        )
        return bbox, cls, ldm


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def parity_pair():
    torch.manual_seed(0)
    tmodel = TFlagship().eval()
    # Randomize BN running stats so eval-mode BN is non-trivial.
    g = torch.Generator().manual_seed(1)
    for m in tmodel.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(
                m.running_mean.shape, generator=g
            ) * 0.1
            m.running_var = (
                torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75
            )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = dataclasses.replace(
        configs.get_model_config("jabd_flagship"), compute_dtype="float32"
    )
    params, stats = TC.convert_flagship_state_dict(sd, cfg)
    jmodel = build_model(cfg, mode="train")
    variables = {"params": params, "batch_stats": stats}
    return tmodel, jmodel, variables, cfg


def test_flagship_forward_parity(parity_pair, rng):
    tmodel, jmodel, variables, cfg = parity_pair
    size = 64
    x = rng.normal(0, 60, (1, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        tb, tc, tl = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    jb, jc, jl = jax.jit(lambda v, i: jmodel.apply(v, i, train=False))(
        variables, jnp.asarray(x)
    )

    for name, tv, jv in [
        ("bbox", tb, jb),
        ("cls", tc, jc),
        ("landm", tl, jl),
    ]:
        t = tv.numpy()
        j = np.asarray(jv)
        assert t.shape == j.shape, name
        np.testing.assert_allclose(j, t, rtol=5e-3, atol=5e-4, err_msg=name)


def test_flagship_decoded_box_iou(parity_pair, rng):
    """BASELINE detection-parity style check: decoded boxes match the torch
    golden at IoU >= 0.99 on confident anchors."""
    tmodel, jmodel, variables, cfg = parity_pair
    size = 64
    x = rng.normal(0, 60, (1, size, size, 3)).astype(np.float32)
    anchors = jnp.asarray(A.generate_anchors(cfg.anchors, (size, size)))

    with torch.no_grad():
        tb, tc, _ = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    jb, jc, _ = jax.jit(lambda v, i: jmodel.apply(v, i, train=False))(
        variables, jnp.asarray(x)
    )
    tbox = np.asarray(B.decode(jnp.asarray(tb.numpy()[0]), anchors,
                               cfg.anchors.variance))
    jbox = np.asarray(B.decode(jb[0], anchors, cfg.anchors.variance))
    ious = np.asarray(
        B.elementwise_diou(jnp.asarray(tbox), jnp.asarray(jbox))
    )
    # elementwise_diou == IoU for identical boxes; use plain IoU via jaccard
    # diagonal-free elementwise form: compute IoU directly.
    inter_w = np.clip(
        np.minimum(tbox[:, 2], jbox[:, 2]) - np.maximum(tbox[:, 0], jbox[:, 0]),
        0, None,
    )
    inter_h = np.clip(
        np.minimum(tbox[:, 3], jbox[:, 3]) - np.maximum(tbox[:, 1], jbox[:, 1]),
        0, None,
    )
    inter = inter_w * inter_h
    area_t = (tbox[:, 2] - tbox[:, 0]) * (tbox[:, 3] - tbox[:, 1])
    area_j = (jbox[:, 2] - jbox[:, 0]) * (jbox[:, 3] - jbox[:, 1])
    iou = inter / (area_t + area_j - inter)
    assert iou.min() > 0.99, f"min decoded IoU {iou.min()}"


@pytest.mark.slow
def test_flagship_parity_realistic_scale(parity_pair, rng):
    """320x320 (taps 40/20/10): exercises the bicubic align_corners ladder
    and the NLM at realistic map sizes."""
    tmodel, jmodel, variables, cfg = parity_pair
    size = 320
    x = rng.normal(0, 60, (1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        tb, tc, tl = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    jb, jc, jl = jax.jit(lambda v, i: jmodel.apply(v, i, train=False))(
        variables, jnp.asarray(x)
    )
    for name, tv, jv in [("bbox", tb, jb), ("cls", tc, jc), ("landm", tl, jl)]:
        np.testing.assert_allclose(
            np.asarray(jv), tv.numpy(), rtol=5e-3, atol=1e-3, err_msg=name
        )
