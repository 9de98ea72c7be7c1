"""Direct parity against the reference's ACTUAL backbone/block modules
(imported read-only from /root/reference, torch CPU): the flagship
MobileNetV3_Large_eca backbone, MobileNetV1-0.25 stages, the SSH module,
and the EPSA PSAModule (reversed-concat quirk included). Skipped when the
reference tree isn't mounted."""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF_ROOT = "/root/reference/JABD2080ti"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not mounted"
)

torch = pytest.importorskip("torch")


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, rel)
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _randomize_bn(model, seed=1):
    import torch.nn as nn

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = (
                torch.randn(m.running_mean.shape, generator=g) * 0.1
            )
            m.running_var = (
                torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75
            )


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.slow
def test_mnv3_large_eca_backbone_parity(rng):
    """The flagship backbone itself: reference MobileNetV3_Large_eca
    (nets/mobilenetV3.py:452-522) taps layer1/2/3 vs MobileNetV3Backbone
    with converter-mapped weights."""
    mv3 = _load("ref_mnv3", "nets/mobilenetV3.py")
    tb = mv3.MobileNetV3_Large_eca().eval()
    _randomize_bn(tb)
    sd = {
        "body." + k: v.detach().numpy() for k, v in tb.state_dict().items()
    }

    import dataclasses

    from jabd_tpu import configs
    from jabd_tpu.models.mobilenet import (
        MNV3_LARGE_3STAGE,
        MobileNetV3Backbone,
    )
    from jabd_tpu.utils.torch_convert import convert_flagship_state_dict

    cfg = configs.get_model_config("jabd_flagship")
    params, stats = convert_flagship_state_dict(sd, cfg)

    backbone = MobileNetV3Backbone(
        stages=tuple(tuple(s) for s in MNV3_LARGE_3STAGE),
        block_attention="eca",
    )
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        h = tb.hs1(tb.bn1(tb.conv1(_nchw(x))))
        t1 = tb.layer1(h)
        t2 = tb.layer2(t1)
        t3 = tb.layer3(t2)
    j1, j2, j3 = jax.jit(lambda v, i: backbone.apply(v, i, train=False))(
        {
            "params": params["backbone"],
            "batch_stats": stats["backbone"],
        },
        jnp.asarray(x),
    )
    for name, tv, jv in [("l1", t1, j1), ("l2", t2, j2), ("l3", t3, j3)]:
        np.testing.assert_allclose(
            np.asarray(jv), _nhwc(tv), rtol=5e-3, atol=5e-4, err_msg=name
        )


def test_mobilenet_v1_025_parity(rng):
    """nets/mobilenet025.py MobileNetV1 stage1/2/3 vs MobileNetV1Backbone."""
    m025 = _load("ref_m025", "nets/mobilenet025.py")
    tb = m025.MobileNetV1().eval()
    _randomize_bn(tb)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    from jabd_tpu.models.mobilenet import MobileNetV1Backbone
    from jabd_tpu.utils.torch_convert import conv2d_w

    # stage1 = [conv_bn, dw*5], stage2 = dw*6, stage3 = dw*2; torch names
    # stage{S}.{i}.{j}.weight with conv_bn = (conv, bn, lrelu) and
    # conv_dw = (dwconv, bn, lrelu, pwconv, bn, lrelu).
    params, stats = {}, {}

    def put_convbn(prefix_conv, prefix_bn, fname):
        params[fname] = {
            "conv": {"kernel": conv2d_w(sd[prefix_conv + ".weight"])},
            "bn": {"scale": sd[prefix_bn + ".weight"],
                   "bias": sd[prefix_bn + ".bias"]},
        }
        stats[fname] = {
            "bn": {"mean": sd[prefix_bn + ".running_mean"],
                   "var": sd[prefix_bn + ".running_var"]}
        }

    put_convbn("stage1.0.0", "stage1.0.1", "stem")
    dw_idx = 0
    for stage, count in (("stage1", 5), ("stage2", 6), ("stage3", 2)):
        start = 1 if stage == "stage1" else 0
        for i in range(start, start + count):
            put_convbn(f"{stage}.{i}.0", f"{stage}.{i}.1",
                       f"dw{dw_idx}_depth")
            put_convbn(f"{stage}.{i}.3", f"{stage}.{i}.4",
                       f"dw{dw_idx}_point")
            dw_idx += 1

    backbone = MobileNetV1Backbone()
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t1 = tb.stage1(_nchw(x))
        t2 = tb.stage2(t1)
        t3 = tb.stage3(t2)
    j1, j2, j3 = jax.jit(lambda v, i: backbone.apply(v, i, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    for name, tv, jv in [("s1", t1, j1), ("s2", t2, j2), ("s3", t3, j3)]:
        np.testing.assert_allclose(
            np.asarray(jv), _nhwc(tv), rtol=5e-3, atol=5e-4, err_msg=name
        )


def _ensure_torchvision_stub():
    """nets/retinaface.py imports torchvision only for
    IntermediateLayerGetter (and the unused-here resnet constructors);
    torchvision isn't in this environment, so provide the standard
    helper's semantics: keep children up to the last requested layer,
    return an OrderedDict of the requested taps."""
    try:
        import torchvision.models._utils  # noqa: F401

        return
    except ImportError:
        pass
    import types
    from collections import OrderedDict

    import torch.nn as nn

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            return_layers = {str(k): str(v) for k, v in return_layers.items()}
            remaining = dict(return_layers)
            layers = OrderedDict()
            for name, module in model.named_children():
                layers[name] = module
                remaining.pop(name, None)
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = return_layers

        def forward(self, x):
            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_utils = types.ModuleType("torchvision.models._utils")
    tv_utils.IntermediateLayerGetter = IntermediateLayerGetter
    tv_models._utils = tv_utils
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models._utils"] = tv_utils


def _load_ref_vanilla_retinaface():
    """Import the reference's own nets/retinaface.py (needs the `nets`
    package on sys.path for its intra-package imports)."""
    _ensure_torchvision_stub()
    sys.path.insert(0, REF_ROOT)
    try:
        import nets.retinaface as ref_rf  # noqa: F401

        return ref_rf
    finally:
        sys.path.remove(REF_ROOT)


# cfg for the vanilla mobilenet0.25 assembly: the live cfg_mnet was
# repurposed for the MNv3 backbone (utils/config.py:13-18 comments show
# the original stage1..3 / 32 / 64 values this assembly needs).
_MNET025_CFG = {
    "name": "mobilenet0.25",
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "loc_weight": 2.0,
    "train_image_size": 840,
    "return_layers": {"stage1": 1, "stage2": 2, "stage3": 3},
    "in_channel": 32,
    "out_channel": 64,
}


@pytest.mark.slow
def test_mnet025_full_detector_parity(rng):
    """FULL vanilla RetinaFace (nets/retinaface.py:64, mobilenet0.25 +
    FPN + SSH + heads) vs our retinaface_mnet025 preset with
    convert_mnet025_state_dict-mapped weights."""
    ref_rf = _load_ref_vanilla_retinaface()
    tm = ref_rf.RetinaFace(cfg=_MNET025_CFG, pretrained=False,
                           mode="train").eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    import dataclasses

    from jabd_tpu import configs
    from jabd_tpu.models import build_model
    from jabd_tpu.utils.torch_convert import convert_mnet025_state_dict

    cfg = dataclasses.replace(
        configs.get_model_config("retinaface_mnet025"),
        compute_dtype="float32",
    )
    params, stats = convert_mnet025_state_dict(sd, cfg)
    model = build_model(cfg, mode="train")

    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_bbox, t_cls, t_landm = tm(_nchw(x))
    j_bbox, j_cls, j_landm = jax.jit(
        lambda v, i: model.apply(v, i, train=False)
    )({"params": params, "batch_stats": stats}, jnp.asarray(x))
    for name, tv, jv in [
        ("bbox", t_bbox, j_bbox),
        ("cls", t_cls, j_cls),
        ("landm", t_landm, j_landm),
    ]:
        np.testing.assert_allclose(
            np.asarray(jv), tv.numpy(), rtol=5e-3, atol=5e-4, err_msg=name
        )


@pytest.mark.slow
def test_cli_routes_mnet025_pth(tmp_path, rng):
    """cli --weights routing: a vanilla-RetinaFace .pth must dispatch to
    the mnet025 converter (it used to crash in the flagship converter)."""
    ref_rf = _load_ref_vanilla_retinaface()
    tm = ref_rf.RetinaFace(cfg=_MNET025_CFG, pretrained=False,
                           mode="train").eval()
    _randomize_bn(tm)
    pth = str(tmp_path / "mnet025.pth")
    torch.save(tm.state_dict(), pth)

    import argparse

    from jabd_tpu.cli import _load_predictor

    args = argparse.Namespace(
        model="retinaface_mnet025", weights=pth, confidence=0.5,
        nms_iou=0.45, input_size=64,
    )
    pred = _load_predictor(args)
    # The converter must have produced the full model surface (backbone +
    # fpn + ssh + heads); fold_bn ran, so check the folded param tree.
    p = pred.variables["params"]
    assert "backbone" in p and "fpn" in p and "class_head1" in p


def test_ssh_parity(rng):
    """nets/layers.py SSH vs models.layers.SSH with converted weights."""
    layers = _load("ref_layers", "nets/layers.py")
    tssh = layers.SSH(64, 64).eval()
    _randomize_bn(tssh)
    sd = {"ssh1." + k: v.detach().numpy() for k, v in tssh.state_dict().items()}

    import dataclasses

    from jabd_tpu import configs
    from jabd_tpu.models.layers import SSH
    from jabd_tpu.utils.torch_convert import _Map

    params, stats = {}, {}
    m = _Map(sd, params, stats)
    for tname, fname in [
        ("conv3X3", "conv3x3"),
        ("conv5X5_1", "conv5x5_1"),
        ("conv5X5_2", "conv5x5_2"),
        ("conv7X7_2", "conv7x7_2"),
        ("conv7x7_3", "conv7x7_3"),
    ]:
        m.convbn(f"ssh1.{tname}.0", f"ssh1.{tname}.1", ("ssh1", fname))

    ssh = SSH(out_channels=64)
    x = rng.normal(0, 1, (1, 8, 8, 64)).astype(np.float32)
    with torch.no_grad():
        want = tssh(_nchw(x))
    got = ssh.apply(
        {"params": params["ssh1"], "batch_stats": stats["ssh1"]},
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), _nhwc(want), rtol=5e-3, atol=5e-4
    )


def test_psa_module_parity(rng):
    """nets/EPSA50.py PSAModule (multi-kernel grouped convs + SE-softmax
    fusion, REVERSED recombine order) vs models.epsa.PSAModule."""
    epsa = _load("ref_epsa", "nets/EPSA50.py")
    tpsa = epsa.PSAModule(64, 64).eval()
    _randomize_bn(tpsa)
    sd = {k: v.detach().numpy() for k, v in tpsa.state_dict().items()}

    from jabd_tpu.models.epsa import PSAModule
    from jabd_tpu.utils.torch_convert import conv2d_w

    params = {}
    for i in range(1, 5):
        params[f"conv_{i}"] = {
            "kernel": conv2d_w(sd[f"conv_{i}.weight"])
        }
    params["se"] = {
        "fc1": {"kernel": conv2d_w(sd["se.fc1.weight"]),
                "bias": sd["se.fc1.bias"]},
        "fc2": {"kernel": conv2d_w(sd["se.fc2.weight"]),
                "bias": sd["se.fc2.bias"]},
    }

    psa = PSAModule(planes=64)
    x = rng.normal(0, 1, (1, 8, 8, 64)).astype(np.float32)
    with torch.no_grad():
        want = tpsa(_nchw(x))
    got = psa.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got), _nhwc(want), rtol=5e-3, atol=5e-4
    )
