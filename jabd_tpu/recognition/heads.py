"""Margin-softmax heads: AdaFace, ArcFace, CosFace.

The reference's `head.py` is MISSING from the repo (train_val.py:9,35
imports `head.build_head`, so the recognition trainer cannot run as
shipped — SURVEY.md section 0). Re-implemented here from the AdaFace
paper ("AdaFace: Quality Adaptive Margin for Face Recognition",
CVPR 2022) and the standard ArcFace/CosFace definitions, with the
interface train_val.py expects: head(embeddings, norms, labels) ->
cos_thetas scaled logits.

AdaFace: the margin adapts to image quality proxied by the feature norm.
With batch-standardized norms z = clip((||f|| - mu)/(sigma/h), -1, 1):
  g_angular  = -m * z       (arc margin, harder for high-norm)
  g_additive =  m * z + m   (cosine margin)
  logit_target = s * (cos(theta + g_angular) - g_additive)
mu/sigma track batch statistics with EMA momentum 0.01.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _kernel_width(classnum: int, pad_to: int) -> int:
    """Classifier width including padding columns (see class docstrings:
    pad_to > 0 rounds the class count up to a multiple — used by the
    class-sharded head (recognition/parallel.py) so the kernel divides
    evenly across the mesh)."""
    if pad_to <= 1:
        return classnum
    return -(-classnum // pad_to) * pad_to


def _normalized_kernel(module, embedding_size, classnum, dtype, pad_to=0):
    kernel = module.param(
        "kernel",
        nn.initializers.normal(0.01),
        (embedding_size, _kernel_width(classnum, pad_to)),
        jnp.float32,
    ).astype(dtype)
    return kernel / jnp.clip(
        jnp.linalg.norm(kernel, axis=0, keepdims=True), 1e-12, None
    )


def _mask_padded(logits, classnum: int):
    """Padding columns get a large negative logit: their softmax mass is
    exactly 0 in f32 (exp(-3e4 - max) underflows), so the padded head is
    numerically identical to the unpadded one, and their gradient is 0
    (softmax prob 0, one-hot 0; the `where` blocks the cosine path)."""
    if logits.shape[-1] == classnum:
        return logits
    pad_mask = jnp.arange(logits.shape[-1]) >= classnum
    return jnp.where(pad_mask, jnp.asarray(-3e4, logits.dtype), logits)


class AdaFaceHead(nn.Module):
    classnum: int
    embedding_size: int = 512
    m: float = 0.4
    h: float = 0.333
    s: float = 64.0
    t_alpha: float = 0.01  # EMA momentum of the norm statistics
    eps: float = 1e-3
    pad_to: int = 0  # round kernel width up to a multiple (class sharding)

    @nn.compact
    def __call__(self, embeddings, norms, labels, train: bool = False):
        """embeddings: [B, D] l2-normalized; norms: [B, 1]; labels: [B]."""
        kernel = _normalized_kernel(
            self, self.embedding_size, self.classnum, embeddings.dtype,
            self.pad_to,
        )
        # precision=HIGHEST: TPU default matmul precision is bf16 even
        # for f32 inputs (CLAUDE.md); ~3e-3 cosine error becomes +-0.2
        # noise on s=64-scaled logits feeding arccos — this matmul is
        # the accuracy-critical one the f32 policy exists for.
        cosine = jnp.clip(
            jnp.matmul(
                embeddings, kernel, precision=jax.lax.Precision.HIGHEST
            ),
            -1 + self.eps,
            1 - self.eps,
        )

        # stop_gradient mirrors the reference's safe_norms.clone()
        # .detach() (official AdaFace): the margin scaler is a QUALITY
        # OBSERVATION, not a gradient path — without the detach the
        # model can shrink/grow feature norms to manipulate its own
        # margin, a dynamic the paper explicitly removes.
        safe_norms = jax.lax.stop_gradient(jnp.clip(norms, 0.001, 100.0))
        batch_mean = self.variable(
            "batch_stats", "batch_mean", lambda: jnp.asarray(20.0)
        )
        batch_std = self.variable(
            "batch_stats", "batch_std", lambda: jnp.asarray(100.0)
        )
        if train:
            mean = jnp.mean(safe_norms)
            std = jnp.std(safe_norms, ddof=1)  # torch.std is unbiased
            batch_mean.value = (
                self.t_alpha * mean + (1 - self.t_alpha) * batch_mean.value
            )
            batch_std.value = (
                self.t_alpha * std + (1 - self.t_alpha) * batch_std.value
            )

        margin_scaler = (safe_norms[:, 0] - batch_mean.value) / (
            batch_std.value + self.eps
        )
        margin_scaler = jnp.clip(margin_scaler * self.h, -1.0, 1.0)

        onehot = jax.nn.one_hot(
            labels, cosine.shape[-1], dtype=cosine.dtype
        )

        # Target-column-only margin. The textbook formulation runs
        # arccos/cos over the whole [B, C] matrix, but off the target
        # column it is the identity (cos(arccos x) = x; gradient
        # sin(theta)/sqrt(1-x^2) = 1, and the eps-clip is inactive for
        # |x| <= 1-eps since arccos(1-eps) > eps) — at C = 70k classes
        # that is O(B*C) wasted VPU transcendentals in BOTH passes
        # (arccos' backward is a rsqrt over the full matrix). Compute
        # the margined logit for the target entry alone, O(B):
        #   g_angular:  theta_target + (-m * scaler)
        #   g_additive: subtract m * (scaler + 1) from the target logit
        tgt = jnp.sum(cosine * onehot, axis=-1, keepdims=True)  # [B, 1]
        m_arc = -self.m * margin_scaler[:, None]
        theta_m = jnp.clip(
            jnp.arccos(tgt) + m_arc, self.eps, jnp.pi - self.eps
        )
        m_cos = self.m * margin_scaler[:, None] + self.m
        tgt_new = jnp.cos(theta_m) - m_cos
        cosine = cosine + (tgt_new - tgt) * onehot
        return _mask_padded(cosine * self.s, self.classnum)


class ArcFaceHead(nn.Module):
    classnum: int
    embedding_size: int = 512
    m: float = 0.5
    s: float = 64.0
    eps: float = 1e-3
    pad_to: int = 0

    @nn.compact
    def __call__(self, embeddings, norms, labels, train: bool = False):
        kernel = _normalized_kernel(
            self, self.embedding_size, self.classnum, embeddings.dtype,
            self.pad_to,
        )
        # precision=HIGHEST: TPU default matmul precision is bf16 even
        # for f32 inputs (CLAUDE.md); ~3e-3 cosine error becomes +-0.2
        # noise on s=64-scaled logits feeding arccos — this matmul is
        # the accuracy-critical one the f32 policy exists for.
        cosine = jnp.clip(
            jnp.matmul(
                embeddings, kernel, precision=jax.lax.Precision.HIGHEST
            ),
            -1 + self.eps,
            1 - self.eps,
        )
        onehot = jax.nn.one_hot(
            labels, cosine.shape[-1], dtype=cosine.dtype
        )
        # Target-column-only arc margin (see AdaFaceHead: the full-matrix
        # arccos/cos is the identity off the target column; O(B) instead
        # of O(B*C) transcendentals in forward AND backward).
        tgt = jnp.sum(cosine * onehot, axis=-1, keepdims=True)
        theta_m = jnp.clip(
            jnp.arccos(tgt) + self.m, self.eps, jnp.pi - self.eps
        )
        cosine = cosine + (jnp.cos(theta_m) - tgt) * onehot
        return _mask_padded(cosine * self.s, self.classnum)


class CosFaceHead(nn.Module):
    classnum: int
    embedding_size: int = 512
    m: float = 0.4
    s: float = 64.0
    eps: float = 1e-3
    pad_to: int = 0

    @nn.compact
    def __call__(self, embeddings, norms, labels, train: bool = False):
        kernel = _normalized_kernel(
            self, self.embedding_size, self.classnum, embeddings.dtype,
            self.pad_to,
        )
        # precision=HIGHEST: TPU default matmul precision is bf16 even
        # for f32 inputs (CLAUDE.md); ~3e-3 cosine error becomes +-0.2
        # noise on s=64-scaled logits feeding arccos — this matmul is
        # the accuracy-critical one the f32 policy exists for.
        cosine = jnp.clip(
            jnp.matmul(
                embeddings, kernel, precision=jax.lax.Precision.HIGHEST
            ),
            -1 + self.eps,
            1 - self.eps,
        )
        onehot = jax.nn.one_hot(
            labels, cosine.shape[-1], dtype=cosine.dtype
        )
        return _mask_padded(
            (cosine - self.m * onehot) * self.s, self.classnum
        )


def build_head(
    head_type: str = "adaface",
    embedding_size: int = 512,
    class_num: int = 70722,
    m: float = 0.4,
    h: float = 0.333,
    t_alpha: float = 0.01,
    s: float = 64.0,
    pad_to: int = 0,
):
    """The interface train_val.py:34-42 expects from the missing head.py.

    pad_to > 0 pads the classifier width to a multiple (exact — padded
    columns are masked to -3e4 pre-softmax); the class-sharded trainer
    (recognition/parallel.py) passes the mesh size here so the kernel
    divides evenly across devices."""
    head_type = head_type.lower()
    if head_type == "adaface":
        return AdaFaceHead(
            classnum=class_num, embedding_size=embedding_size, m=m, h=h,
            s=s, t_alpha=t_alpha, pad_to=pad_to,
        )
    if head_type == "arcface":
        return ArcFaceHead(
            classnum=class_num, embedding_size=embedding_size, m=m, s=s,
            pad_to=pad_to,
        )
    if head_type == "cosface":
        return CosFaceHead(
            classnum=class_num, embedding_size=embedding_size, m=m, s=s,
            pad_to=pad_to,
        )
    raise ValueError(f"unknown head type {head_type!r}")
