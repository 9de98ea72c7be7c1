"""Full-model torch parity for the predict.py assembly
(nets/retinaface_eca_nonlocal.py): ResNet body (reduced depth for test
speed) + avg-ECA with SIGMOID gate on taps + nearest-upsample FPN with
NLM(ch=4, psp 1/4/8/12) + eca_fpn + SSH(256) + heads."""

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
from jabd_tpu.utils.torch_convert import (  # noqa: E402
    convert_resnet_detector_state_dict,
)
from tests.test_torch_convert_more import TResNetBody, _randomize_bn  # noqa: E402
from tests.test_torch_parity import (  # noqa: E402
    THead,
    TNLM,
    TSSH,
    _conv_bn,
)


class TEcaSigmoid(nn.Module):
    """eca_block with SIGMOID gate (nets/retinaface_eca_nonlocal.py:203-219)."""

    def __init__(self, channel, b=1, gamma=2):
        super().__init__()
        k = int(abs((math.log(channel, 2) + b) / gamma))
        k = k if k % 2 else k + 1
        self.conv = nn.Conv1d(1, 1, kernel_size=k, padding=(k - 1) // 2,
                              bias=False)

    def forward(self, x):
        y = F.adaptive_avg_pool2d(x, 1)
        y = self.conv(y.squeeze(-1).transpose(-1, -2)).transpose(-1, -2)
        return x * torch.sigmoid(y.unsqueeze(-1)).expand_as(x)


class TFPNNearestNLM(nn.Module):
    """FPN with nearest upsample + shared NLM
    (nets/retinaface_eca_nonlocal.py:37-90)."""

    def __init__(self, in_list, out):
        super().__init__()
        leaky = 0.1 if out <= 64 else 0.0
        self.output1 = _conv_bn(in_list[0], out, 1, 1, leaky)
        self.output2 = _conv_bn(in_list[1], out, 1, 1, leaky)
        self.output3 = _conv_bn(in_list[2], out, 1, 1, leaky)
        self.merge1 = _conv_bn(out, out, 3, 1, leaky)
        self.merge2 = _conv_bn(out, out, 3, 1, leaky)
        # capital N matches the reference attribute (retinaface_eca_nonlocal.py:50)
        self.Nlm = TNLM(out, ch=4, psp=(1, 4, 8, 12))

    def forward(self, inputs):
        o1 = self.output1(inputs[0])
        o2 = self.output2(inputs[1])
        o3 = self.output3(inputs[2])
        up3 = F.interpolate(o3, size=o2.shape[2:], mode="nearest")
        o2 = self.merge2(o2 + self.Nlm(up3))
        up2 = F.interpolate(o2, size=o1.shape[2:], mode="nearest")
        o1 = self.merge1(o1 + self.Nlm(up2))
        return [o1, o2, o3]


class TRe50EcaNonlocal(nn.Module):
    def __init__(self, layers=(2, 2, 2, 2)):
        super().__init__()
        self.body = TResNetBody(layers)
        # legacy names eca_64/128/256 despite 512/1024/2048 channels
        # (nets/retinaface_eca_nonlocal.py:280-282).
        self.eca_64 = TEcaSigmoid(512)
        self.eca_128 = TEcaSigmoid(1024)
        self.eca_256 = TEcaSigmoid(2048)
        self.fpn = TFPNNearestNLM([512, 1024, 2048], 256)
        self.eca_fpn = TEcaSigmoid(256)
        self.ssh1 = TSSH(256, 256)
        self.ssh2 = TSSH(256, 256)
        self.ssh3 = TSSH(256, 256)
        self.ClassHead = nn.ModuleList([THead(256, 2) for _ in range(3)])
        self.BboxHead = nn.ModuleList([THead(256, 4) for _ in range(3)])
        self.LandmarkHead = nn.ModuleList(
            [THead(256, 10) for _ in range(3)]
        )

    def forward(self, x):
        t1, t2, t3 = self.body(x)
        out = [self.eca_64(t1), self.eca_128(t2), self.eca_256(t3)]
        fpn = self.fpn(out)
        feats = [
            self.ssh1(self.eca_fpn(fpn[0])),
            self.ssh2(self.eca_fpn(fpn[1])),
            self.ssh3(self.eca_fpn(fpn[2])),
        ]
        bbox = torch.cat(
            [self.BboxHead[i](f) for i, f in enumerate(feats)], 1
        )
        cls = torch.cat(
            [self.ClassHead[i](f) for i, f in enumerate(feats)], 1
        )
        ldm = torch.cat(
            [self.LandmarkHead[i](f) for i, f in enumerate(feats)], 1
        )
        return bbox, cls, ldm


@pytest.mark.slow
def test_re50_eca_nonlocal_parity(rng):
    torch.manual_seed(0)
    tmodel = TRe50EcaNonlocal(layers=(2, 2, 2, 2)).eval()
    _randomize_bn(tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from jabd_tpu.models import resnet as RN

    old = RN.RESNET_SPECS["resnet50"]
    RN.RESNET_SPECS["resnet50"] = (
        [2, 2, 2, 2], [64, 128, 256, 512], (1, 2, 3)
    )
    try:
        cfg = dataclasses.replace(
            configs.get_model_config("re50_eca_nonlocal"),
            compute_dtype="float32",
        )
        params, stats = convert_resnet_detector_state_dict(sd, cfg)
        jmodel = build_model(cfg, mode="train")
        variables = {"params": params, "batch_stats": stats}
        x = rng.normal(0, 60, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tb, tc, tl = tmodel(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            )
        jb, jc, jl = jax.jit(lambda v, i: jmodel.apply(v, i, train=False))(
            variables, jnp.asarray(x)
        )
        for name, tv, jv in [
            ("bbox", tb, jb),
            ("cls", tc, jc),
            ("landm", tl, jl),
        ]:
            np.testing.assert_allclose(
                np.asarray(jv), tv.numpy(), rtol=5e-3, atol=2e-3,
                err_msg=name,
            )
    finally:
        RN.RESNET_SPECS["resnet50"] = old


class TFPN152(nn.Module):
    """Exact FPN_152 wiring (nets/layers.py:172-245): shared merge2, dead
    merge1; order 2->1 (raw), 4->3, 3->2 (merged l3)."""

    def __init__(self, in_list, out):
        super().__init__()
        leaky = 0.1 if out <= 64 else 0.0
        self.output1 = _conv_bn(in_list[0], out, 1, 1, leaky)
        self.output2 = _conv_bn(in_list[1], out, 1, 1, leaky)
        self.output3 = _conv_bn(in_list[2], out, 1, 1, leaky)
        self.output4 = _conv_bn(in_list[3], out, 1, 1, leaky)
        self.merge1 = _conv_bn(out, out, 3, 1, leaky)  # dead
        self.merge2 = _conv_bn(out, out, 3, 1, leaky)

    def forward(self, inputs):
        o1 = self.output1(inputs[0])
        o2 = self.output2(inputs[1])
        o3 = self.output3(inputs[2])
        o4 = self.output4(inputs[3])
        up2 = F.interpolate(o2, size=o1.shape[2:], mode="nearest")
        o1 = self.merge2(o1 + up2)
        up4 = F.interpolate(o4, size=o3.shape[2:], mode="nearest")
        o3 = self.merge2(o3 + up4)
        up3 = F.interpolate(o3, size=o2.shape[2:], mode="nearest")
        o2 = self.merge2(o2 + up3)
        return [o1, o2, o3, o4]


def test_fpn152_variant_parity(rng):
    from jabd_tpu.models import layers as L
    from jabd_tpu.utils.torch_convert import conv2d_w

    torch.manual_seed(0)
    in_list = [32, 48, 64, 80]
    tfpn = TFPN152(in_list, 64).eval()
    _randomize_bn(tfpn)
    sd = {k: v.detach().numpy() for k, v in tfpn.state_dict().items()}

    params, stats = {}, {}

    def put(tname, fname):
        params[fname] = {
            "conv": {"kernel": conv2d_w(sd[f"{tname}.0.weight"])},
            "bn": {"scale": sd[f"{tname}.1.weight"],
                   "bias": sd[f"{tname}.1.bias"]},
        }
        stats[fname] = {
            "bn": {"mean": sd[f"{tname}.1.running_mean"],
                   "var": sd[f"{tname}.1.running_var"]}
        }

    for i in range(4):
        put(f"output{i + 1}", f"output{i + 1}")
    put("merge2", "merge_shared")

    fpn = L.FPN(out_channels=64, upsample="nearest", variant="raw152")
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2)]
    xs = [
        rng.normal(0, 1, (1, *s, c)).astype(np.float32)
        for s, c in zip(sizes, in_list)
    ]
    with torch.no_grad():
        want = tfpn([
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))) for x in xs
        ])
    got = fpn.apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(x) for x in xs],
        train=False,
    )
    for i, (jv, tv) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(jv),
            np.transpose(tv.numpy(), (0, 2, 3, 1)),
            rtol=5e-3,
            atol=1e-4,
            err_msg=f"level {i}",
        )
