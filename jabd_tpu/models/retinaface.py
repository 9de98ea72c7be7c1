"""Unified RetinaFace/JABD detector graph.

One config-parameterized model replaces the reference's 14
`nets/retinaface*.py` copy-paste variants plus the inline train-script
classes. The flagship JABD assembly (train_mobilenetV3_ecagai.py:319-435)
is:

  backbone taps -> [tap ECA] -> FPN(upsample [+NLM]) -> [fpn ECA] -> SSH
  -> per-level 1x1 heads -> concat over levels
  -> (bbox [B,N,4], cls [B,N,2], landm [B,N,10])  (+softmax in eval mode)

All attention placements / statistics / gates / upsample modes are
ModelConfig switches (see jabd_tpu.configs.MODEL_PRESETS for the mapping
to each reference variant).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jabd_tpu.configs import ModelConfig
from jabd_tpu.models import layers as L
from jabd_tpu.models import mobilenet as M
from jabd_tpu.models import resnet as RN

Dtype = Any


def _dtype_of(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _make_backbone(cfg: ModelConfig, dtype) -> nn.Module:
    if cfg.backbone == "mobilenet_v1_025":
        return M.MobileNetV1Backbone(dtype=dtype, name="backbone")
    if cfg.backbone == "mobilenet_v3_large":
        stages = (
            M.MNV3_LARGE_4STAGE if cfg.num_levels == 4 else M.MNV3_LARGE_3STAGE
        )
        return M.MobileNetV3Backbone(
            stages=tuple(tuple(s) for s in stages),
            block_attention=cfg.backbone_block_attention,
            dtype=dtype,
            name="backbone",
        )
    if cfg.backbone == "epsanet50":
        from jabd_tpu.models.epsa import EPSANetBackbone

        return EPSANetBackbone(dtype=dtype, name="backbone")
    rn_name = cfg.backbone
    # retinaface_152.py taps layer1..4 of ResNet-152 for the 4-level FPN.
    if rn_name == "resnet152" and cfg.num_levels == 4:
        rn_name = "resnet152_l4"
    if rn_name in RN.RESNET_SPECS:
        blocks, planes, taps = RN.RESNET_SPECS[rn_name]
        return RN.ResNetBackbone(
            blocks=tuple(blocks),
            planes=tuple(planes),
            taps=taps,
            dtype=dtype,
            name="backbone",
        )
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


def _eca_kind(kind: str) -> str:
    return "stdv" if kind == "eca_stdv" else "avg"


class RetinaFace(nn.Module):
    """mode: 'train' returns raw logits; 'eval' applies softmax to the
    classifications (nets/retinaface_eca_nonlocal.py:355-359)."""

    cfg: ModelConfig
    mode: str = "train"

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        x = images.astype(dtype)

        backbone = _make_backbone(cfg, dtype)
        taps = backbone(x, train)
        if cfg.backbone == "resnet152" and cfg.num_levels == 4:
            assert len(taps) == 4
        taps = taps[: cfg.num_levels]
        assert len(taps) == cfg.num_levels, (
            f"backbone produced {len(taps)} taps, config wants "
            f"{cfg.num_levels}"
        )

        # Dropout on the raw backbone taps
        # (retinaface_eca_nonlocal_droupout.py:322-325: F.dropout(p=0.5)
        # on the three body outputs before eca_64/128/256). Torch's
        # functional F.dropout defaults training=True so the reference
        # drops at eval too; here eval is deterministic (PARITY.md).
        if cfg.tap_dropout > 0.0:
            drop = nn.Dropout(rate=cfg.tap_dropout, name="tap_dropout")
            taps = [drop(t, deterministic=not train) for t in taps]

        # External ECA on the backbone taps (eca_40/80/160 flagship,
        # eca_512/1024/2048 in retinaface_eca_nonlocal.py:323-325).
        if cfg.tap_attention:
            kind = _eca_kind(cfg.tap_attention)
            taps = [
                L.ECA(
                    statistic=kind,
                    gate=cfg.eca_gate,
                    dtype=dtype,
                    name=f"eca_tap{i + 1}",
                )(t)
                for i, t in enumerate(taps)
            ]

        fpn = L.FPN(
            out_channels=cfg.out_channels,
            upsample=cfg.fpn_upsample,
            nlm_ch=cfg.nlm.ch if cfg.nlm else None,
            nlm_psp=cfg.nlm.psp_sizes if cfg.nlm else (1, 3, 6, 8),
            variant=cfg.fpn_variant,
            dtype=dtype,
            name="fpn",
        )(taps, train)

        # Per-level ECA before SSH (eca_fpn). The reference shares ONE
        # eca_fpn module across levels (train_mobilenetV3_ecagai.py:419-421)
        # — ECA's only parameter is the k-tap 1-D conv, shared here too.
        if cfg.fpn_attention:
            eca_fpn = L.ECA(
                statistic=_eca_kind(cfg.fpn_attention),
                gate=cfg.eca_gate,
                dtype=dtype,
                name="eca_fpn",
            )
            fpn = [eca_fpn(f) for f in fpn]

        # ssh_share_level4: the 4-level reference assemblies run ssh3 on
        # BOTH levels 3 and 4 (retinaface_152.py:150-154 /
        # retinaface50_self.py:148-152 `feature4 = self.ssh3(fpn[3])`;
        # their ssh4/ssh5 are constructed but never called).
        sshes = []
        for i in range(len(fpn)):
            if cfg.ssh_share_level4 and i == 3:
                sshes.append(sshes[2])
            else:
                sshes.append(
                    L.SSH(cfg.out_channels, dtype=dtype, name=f"ssh{i + 1}")
                )
        features = [ssh(f, train) for ssh, f in zip(sshes, fpn)]

        bbox = jnp.concatenate(
            [
                L.PredictionHead(
                    4, cfg.anchors_per_cell, dtype=dtype,
                    name=f"bbox_head{i + 1}",
                )(f)
                for i, f in enumerate(features)
            ],
            axis=1,
        )
        cls = jnp.concatenate(
            [
                L.PredictionHead(
                    2, cfg.anchors_per_cell, dtype=dtype,
                    name=f"class_head{i + 1}",
                )(f)
                for i, f in enumerate(features)
            ],
            axis=1,
        )
        landm = jnp.concatenate(
            [
                L.PredictionHead(
                    10, cfg.anchors_per_cell, dtype=dtype,
                    name=f"landmark_head{i + 1}",
                )(f)
                for i, f in enumerate(features)
            ],
            axis=1,
        )

        # Emit float32 regardless of compute dtype: the decode/NMS/loss
        # stages need full precision.
        bbox = bbox.astype(jnp.float32)
        cls = cls.astype(jnp.float32)
        landm = landm.astype(jnp.float32)
        if self.mode == "eval":
            cls = jax.nn.softmax(cls, axis=-1)
        if cfg.with_iou_head:
            iou = jnp.concatenate(
                [
                    L.PredictionHead(
                        1, cfg.anchors_per_cell, dtype=dtype,
                        name=f"iou_head{i + 1}",
                    )(f)
                    for i, f in enumerate(features)
                ],
                axis=1,
            ).astype(jnp.float32)
            return bbox, cls, landm, iou
        return bbox, cls, landm


def build_model(cfg: ModelConfig, mode: str = "train") -> RetinaFace:
    if (
        cfg.backbone == "mobilenet_v3_large"
        and cfg.num_levels == 4
        and cfg.backbone_block_attention == "eca_g"
    ):
        # _ECAG_BLOCKS (stage, block) indices encode the reference's
        # 3-stage split (MobileNetV3_Large_ecaG); under the 4-stage
        # split they would land on different physical blocks — no
        # reference variant combines ecaG bottlenecks with the 4-level
        # pyramid, so refuse rather than silently mismatch.
        raise ValueError(
            "backbone_block_attention='eca_g' is defined for the "
            "3-level MobileNetV3 split only (no 4-level ecaG variant "
            "exists in the reference)"
        )
    return RetinaFace(cfg=cfg, mode=mode)
