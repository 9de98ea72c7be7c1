"""PyTorch checkpoint -> JAX parameter conversion.

Lets reference users bring their `.pth` state dicts (saved by
train_mobilenetV3_ecagai.py:545-549 style scripts) into the TPU framework
(SURVEY.md section 7 build step 4: state-dict name mapping, BN-fold-free).

The mapping below covers the flagship JABD assembly (inline RetinaFace of
train_mobilenetV3_ecagai.py:319-435, also nets/retinaface_r.py): an
IntermediateLayerGetter'd MobileNetV3 (`body.*`), external ECA taps, the
NLM FPN, eca_fpn, SSH heads and the three prediction head stacks.

Tensor layout transforms:
  conv2d  torch [O, I/g, kh, kw] -> flax [kh, kw, I/g, O]
  conv1d  torch [1, 1, k]        -> flax [k, 1, 1]
  batchnorm weight/bias -> scale/bias; running_mean/var -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from jabd_tpu.configs import ModelConfig
from jabd_tpu.models.mobilenet import MNV3_LARGE_3STAGE, MNV3_LARGE_4STAGE


def conv2d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv1d_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def _convbn(
    params: Dict,
    stats: Dict,
    sd: Dict[str, np.ndarray],
    torch_conv: str,
    torch_bn: str,
    flax_path: Tuple[str, ...],
) -> None:
    """Map a torch conv+bn pair into a jabd ConvBN module."""
    _set(params, flax_path + ("conv", "kernel"), conv2d_w(sd[torch_conv + ".weight"]))
    _set(params, flax_path + ("bn", "scale"), sd[torch_bn + ".weight"])
    _set(params, flax_path + ("bn", "bias"), sd[torch_bn + ".bias"])
    _set(stats, flax_path + ("bn", "mean"), sd[torch_bn + ".running_mean"])
    _set(stats, flax_path + ("bn", "var"), sd[torch_bn + ".running_var"])


def _eca(params, sd, torch_prefix, flax_path):
    _set(
        params,
        flax_path + ("conv1d", "kernel"),
        conv1d_w(sd[torch_prefix + ".conv.weight"]),
    )


def _conv_with_bias(params, sd, torch_prefix, flax_path):
    _set(params, flax_path + ("kernel",), conv2d_w(sd[torch_prefix + ".weight"]))
    _set(params, flax_path + ("bias",), sd[torch_prefix + ".bias"])


def convert_flagship_state_dict(
    sd: Dict[str, np.ndarray], cfg: ModelConfig
) -> Tuple[Dict, Dict]:
    """Convert a flagship-style torch state dict to (params, batch_stats).

    Expected torch names (train_mobilenetV3_ecagai.py:319-435 /
    nets/retinaface_r.py): body.conv1/bn1, body.layer{s}.{b}.*,
    eca_40/80/160, fpn.output*/merge*/nlm.*, eca_fpn, ssh{1..3}.*,
    ClassHead/BboxHead/LandmarkHead.{i}.conv1x1.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    # --- backbone stem ---
    _convbn(params, stats, sd, "body.conv1", "body.bn1", ("backbone", "stem"))

    # --- MobileNetV3 blocks ---
    stages = MNV3_LARGE_4STAGE if cfg.num_levels == 4 else MNV3_LARGE_3STAGE
    for si, stage in enumerate(stages):
        for bi, (k, cin, exp, cout, act, se, stride) in enumerate(stage):
            t = f"body.layer{si + 1}.{bi}"
            f = ("backbone", f"layer{si + 1}_block{bi}")
            _convbn(params, stats, sd, f"{t}.conv1", f"{t}.bn1", f + ("conv1",))
            _convbn(params, stats, sd, f"{t}.conv2", f"{t}.bn2", f + ("conv2",))
            _convbn(params, stats, sd, f"{t}.conv3", f"{t}.bn3", f + ("conv3",))
            if cfg.backbone_block_attention:
                _eca(params, sd, f"{t}.eca", f + ("eca",))
            elif se:
                # Plain Block applies SE: se.se = [pool, conv, bn, relu,
                # conv, hsig] (nets/mobilenetV3.py:22-29).
                _set(params, f + ("se", "fc1", "kernel"),
                     conv2d_w(sd[f"{t}.se.se.1.weight"]))
                _set(params, f + ("se", "bn", "scale"), sd[f"{t}.se.se.2.weight"])
                _set(params, f + ("se", "bn", "bias"), sd[f"{t}.se.se.2.bias"])
                _set(stats, f + ("se", "bn", "mean"),
                     sd[f"{t}.se.se.2.running_mean"])
                _set(stats, f + ("se", "bn", "var"),
                     sd[f"{t}.se.se.2.running_var"])
                _set(params, f + ("se", "fc2", "kernel"),
                     conv2d_w(sd[f"{t}.se.se.4.weight"]))
            # skip path (nets/mobilenetV3.py:117-138)
            if stride == 1 and cin != cout:
                _convbn(params, stats, sd, f"{t}.skip.0", f"{t}.skip.1",
                        f + ("skip_conv",))
            elif stride == 2 and cin != cout:
                _convbn(params, stats, sd, f"{t}.skip.0", f"{t}.skip.1",
                        f + ("skip_dw",))
                _conv_with_bias(params, sd, f"{t}.skip.2", f + ("skip_pw",))
                _set(params, f + ("skip_pw_bn", "scale"), sd[f"{t}.skip.3.weight"])
                _set(params, f + ("skip_pw_bn", "bias"), sd[f"{t}.skip.3.bias"])
                _set(stats, f + ("skip_pw_bn", "mean"),
                     sd[f"{t}.skip.3.running_mean"])
                _set(stats, f + ("skip_pw_bn", "var"),
                     sd[f"{t}.skip.3.running_var"])
            elif stride == 2 and cin == cout:
                _convbn(params, stats, sd, f"{t}.skip.0", f"{t}.skip.1",
                        f + ("skip_dw",))

    _convert_common(sd, cfg, params, stats)
    return params, stats


def _convert_common(
    sd: Dict[str, np.ndarray],
    cfg: ModelConfig,
    params: Dict,
    stats: Dict,
    tap_eca_names: Tuple[str, ...] = (),
) -> None:
    """FPN / NLM / eca taps / SSH / heads — shared by every detector
    assembly (flagship inline model, retinaface_eca_nonlocal.py, ...).

    Sections whose keys are absent are skipped: the reference also loads
    backbone-only pretrained checkpoints (nets/retinaface_r.py:238-246
    strips and loads just the backbone)."""
    # --- external tap ECAs. Flagship names them by tap channel count
    # (eca_40/80/160); the resnet50 eca_nonlocal model keeps legacy names
    # eca_64/128/256 despite 512/1024/2048 channels
    # (nets/retinaface_eca_nonlocal.py:280-282).
    if cfg.tap_attention:
        names = tap_eca_names or tuple(
            f"eca_{ch}" for ch in cfg.in_channels[: cfg.num_levels]
        )
        for i, name in enumerate(names):
            if f"{name}.conv.weight" in sd:
                _eca(params, sd, name, (f"eca_tap{i + 1}",))

    # --- FPN ---
    if "fpn.output1.0.weight" not in sd:
        return  # backbone-only checkpoint
    for i in range(cfg.num_levels):
        _convbn(params, stats, sd, f"fpn.output{i + 1}.0",
                f"fpn.output{i + 1}.1", ("fpn", f"output{i + 1}"))
    if cfg.fpn_variant == "cascade":
        for i in range(cfg.num_levels - 1):
            _convbn(params, stats, sd, f"fpn.merge{i + 1}.0",
                    f"fpn.merge{i + 1}.1", ("fpn", f"merge{i + 1}"))
    else:
        # FPN_152/FPN_152_5 share one live merge conv named merge2
        # (their merge1 is dead — nets/layers.py:184-185,240,305).
        _convbn(params, stats, sd, "fpn.merge2.0", "fpn.merge2.1",
                ("fpn", "merge_shared"))
    if cfg.nlm is not None:
        for name in ("f_query", "f_key", "f_value", "W"):
            _conv_with_bias(params, sd, f"fpn.nlm.{name}",
                            ("fpn", "nlm", name))
    if cfg.fpn_attention:
        _eca(params, sd, "eca_fpn", ("eca_fpn",))

    # --- SSH ---
    ssh_pairs = [
        ("conv3X3", "conv3x3"),
        ("conv5X5_1", "conv5x5_1"),
        ("conv5X5_2", "conv5x5_2"),
        ("conv7X7_2", "conv7x7_2"),
        ("conv7x7_3", "conv7x7_3"),  # ref lowercase x here (layers.py:54)
    ]
    # ssh_share_level4: level 4 reuses ssh3's weights in the reference
    # forward (retinaface_152.py:154) — its ssh4/ssh5 params are dead and
    # must NOT be converted (our shared graph has no ssh4 module).
    n_ssh = 3 if cfg.ssh_share_level4 else cfg.num_levels
    for i in range(n_ssh):
        for tname, fname in ssh_pairs:
            _convbn(params, stats, sd, f"ssh{i + 1}.{tname}.0",
                    f"ssh{i + 1}.{tname}.1", (f"ssh{i + 1}", fname))

    # --- heads ---
    for i in range(cfg.num_levels):
        _conv_with_bias(params, sd, f"ClassHead.{i}.conv1x1",
                        (f"class_head{i + 1}", "conv1x1"))
        _conv_with_bias(params, sd, f"BboxHead.{i}.conv1x1",
                        (f"bbox_head{i + 1}", "conv1x1"))
        _conv_with_bias(params, sd, f"LandmarkHead.{i}.conv1x1",
                        (f"landmark_head{i + 1}", "conv1x1"))


def convert_resnet_detector_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: ModelConfig,
    tap_eca_names: Tuple[str, ...] = ("eca_64", "eca_128", "eca_256"),
) -> Tuple[Dict, Dict]:
    """Convert a ResNet-backbone detector state dict (the predict.py model
    nets/retinaface_eca_nonlocal.py and the train_50_* baselines).

    torch names: body.conv1/bn1 + body.layer{s}.{i}.conv{1..3}/bn{1..3}
    [+ downsample.0/.1] (torchvision ResNet via IntermediateLayerGetter),
    then the common fpn/ssh/head surface.
    """
    from jabd_tpu.models.resnet import RESNET_SPECS

    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    _convbn(params, stats, sd, "body.conv1", "body.bn1", ("backbone", "stem"))
    rn_name = cfg.backbone
    if rn_name == "resnet152" and cfg.num_levels == 4:
        rn_name = "resnet152_l4"
    blocks, planes, _ = RESNET_SPECS[rn_name]
    in_ch = 64
    for si, (nblocks, p) in enumerate(zip(blocks, planes)):
        stride = 1 if si == 0 else 2
        for bi in range(nblocks):
            t = f"body.layer{si + 1}.{bi}"
            f = ("backbone", f"layer{si + 1}_block{bi}")
            for c in (1, 2, 3):
                _convbn(params, stats, sd, f"{t}.conv{c}", f"{t}.bn{c}",
                        f + (f"conv{c}",))
            s = stride if bi == 0 else 1
            if bi == 0 and (s != 1 or in_ch != p * 4):
                _convbn(params, stats, sd, f"{t}.downsample.0",
                        f"{t}.downsample.1", f + ("downsample",))
            in_ch = p * 4

    _convert_common(sd, cfg, params, stats, tap_eca_names=tap_eca_names)
    return params, stats


def convert_epsa_detector_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: ModelConfig,
    blocks: Tuple[int, ...] = None,
    planes: Tuple[int, ...] = None,
) -> Tuple[Dict, Dict]:
    """Convert an EPSANet-backbone detector state dict (the
    retinaface50_self.py `backbone = epsa50` branch, nets/EPSA50.py).

    torch names per EPSABlock (EPSA50.py:77-116): conv1/bn1,
    conv2 = PSAModule {conv_1..4, se.fc1/fc2}, bn2, conv3/bn3,
    downsample.0/.1; stem body.conv1/bn1.
    """
    from jabd_tpu.models.epsa import EPSANetBackbone

    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    _convbn(params, stats, sd, "body.conv1", "body.bn1", ("backbone", "stem"))
    blocks = blocks if blocks is not None else EPSANetBackbone.blocks
    planes = planes if planes is not None else EPSANetBackbone.planes
    in_ch = 64
    for si, (nblocks, p) in enumerate(zip(blocks, planes)):
        stride = 1 if si == 0 else 2
        for bi in range(nblocks):
            t = f"body.layer{si + 1}.{bi}"
            f = ("backbone", f"layer{si + 1}_block{bi}")
            _convbn(params, stats, sd, f"{t}.conv1", f"{t}.bn1",
                    f + ("conv1",))
            for c in range(1, 5):
                _set(params, f + ("psa", f"conv_{c}", "kernel"),
                     conv2d_w(sd[f"{t}.conv2.conv_{c}.weight"]))
            _conv_with_bias(params, sd, f"{t}.conv2.se.fc1",
                            f + ("psa", "se", "fc1"))
            _conv_with_bias(params, sd, f"{t}.conv2.se.fc2",
                            f + ("psa", "se", "fc2"))
            _set(params, f + ("bn2", "scale"), sd[f"{t}.bn2.weight"])
            _set(params, f + ("bn2", "bias"), sd[f"{t}.bn2.bias"])
            _set(stats, f + ("bn2", "mean"), sd[f"{t}.bn2.running_mean"])
            _set(stats, f + ("bn2", "var"), sd[f"{t}.bn2.running_var"])
            _convbn(params, stats, sd, f"{t}.conv3", f"{t}.bn3",
                    f + ("conv3",))
            s = stride if bi == 0 else 1
            if bi == 0 and (s != 1 or in_ch != p * 4):
                _convbn(params, stats, sd, f"{t}.downsample.0",
                        f"{t}.downsample.1", f + ("downsample",))
            in_ch = p * 4

    _convert_common(sd, cfg, params, stats)
    return params, stats


def convert_mnet025_state_dict(
    sd: Dict[str, np.ndarray], cfg: ModelConfig
) -> Tuple[Dict, Dict]:
    """Convert a vanilla-RetinaFace MobileNetV1-0.25 state dict — the most
    widely distributed pretrained family for this codebase
    (predict.py:80-85 backbone 'mobilenet0.25' path).

    torch names (nets/retinaface.py:64 + nets/mobilenet025.py:21 under
    IntermediateLayerGetter): body.stage1.0 is the conv_bn stem
    (Sequential [conv, bn, leaky]); conv_dw blocks (Sequential
    [dw conv, bn, leaky, pw conv, bn, leaky]) at body.stage1.{1..5},
    body.stage2.{0..5}, body.stage3.{0..1}; then the common
    fpn/ssh/head surface. Bare-backbone checkpoints (the
    mobilenetV1X0.25_pretrain.tar family, 'stage1...' without the 'body.'
    prefix) are accepted too.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if "body.stage1.0.0.weight" not in sd and "stage1.0.0.weight" in sd:
        # Backbone-only pretrain checkpoint: normalize to detector names.
        sd = {
            ("body." + k if k.startswith("stage") else k): v
            for k, v in sd.items()
        }
    params: Dict = {}
    stats: Dict = {}

    _convbn(params, stats, sd, "body.stage1.0.0", "body.stage1.0.1",
            ("backbone", "stem"))
    dw = 0
    for stage, first, count in (
        ("stage1", 1, 5),
        ("stage2", 0, 6),
        ("stage3", 0, 2),
    ):
        for k in range(first, first + count):
            t = f"body.{stage}.{k}"
            _convbn(params, stats, sd, f"{t}.0", f"{t}.1",
                    ("backbone", f"dw{dw}_depth"))
            _convbn(params, stats, sd, f"{t}.3", f"{t}.4",
                    ("backbone", f"dw{dw}_point"))
            dw += 1

    _convert_common(sd, cfg, params, stats)
    return params, stats


def convert_state_dict_auto(
    sd: Dict[str, np.ndarray], cfg: ModelConfig
) -> Tuple[Dict, Dict]:
    """Dispatch to the right converter by the preset's backbone family.

    mobilenet_v1_025 -> mnet025 (stage1..3 conv_bn/conv_dw naming);
    mobilenet_v3_large -> flagship (body.layerN blocks);
    resnet* -> torchvision-ResNet detectors; epsanet50 -> EPSA.
    """
    if cfg.backbone == "mobilenet_v1_025":
        return convert_mnet025_state_dict(sd, cfg)
    if cfg.backbone == "mobilenet_v3_large":
        return convert_flagship_state_dict(sd, cfg)
    if cfg.backbone.startswith("resnet"):
        return convert_resnet_detector_state_dict(sd, cfg)
    if cfg.backbone == "epsanet50":
        return convert_epsa_detector_state_dict(sd, cfg)
    raise ValueError(
        f"no torch converter for backbone {cfg.backbone!r}"
    )


def load_pth(path: str):
    """Load a torch .pth state dict as numpy (CPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k[7:] if k.startswith("module.") else k  # DataParallel prefix
        out[k] = v.detach().numpy()
    return out
