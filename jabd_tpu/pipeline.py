"""Detect -> align -> embed -> identify: the two reference halves joined.

The reference ships a face DETECTOR (predict.py) and a face RECOGNIZER
(net.py + validation_lq/) but never connects them — the recognition
evals read crops aligned by external tooling (tinyface_helper.py:18).
This pipeline wires the JABD detector's 5-point landmarks through the
ArcFace alignment (recognition/align.py) into the IR embedders as one
application surface:

    pipe = FacePipeline(predictor, model, variables)
    dets, embs = pipe.analyze(image)           # [N,15], [N,512] unit-norm
    gallery = Gallery(); gallery.enroll("ann", embs[0])
    names = gallery.match(embs)                # cosine identification

TPU shape discipline: crops are embedded through ONE jitted graph at a
fixed batch size (padded chunks) — per-face dispatches or per-count
recompiles would thrash the compile cache exactly like per-size serving
did before plan_letterbox (ops/image.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from jabd_tpu.recognition.align import align_from_detections


class FacePipeline:
    """End-to-end faces-in-image -> identity embeddings.

    `predictor` is a jabd_tpu.predict.Predictor (any detection preset);
    `model`/`variables` an IR embedder (recognition.build_model — fold /
    int8 variables work unchanged). `embed_batch` fixes the jitted
    embedding batch size."""

    def __init__(
        self,
        predictor,
        model,
        variables,
        embed_batch: int = 16,
        crop_size: int = 112,
    ):
        import jax

        self.predictor = predictor
        self.model = model
        self.variables = variables
        self.embed_batch = embed_batch
        self.crop_size = crop_size

        @jax.jit
        def _embed(variables, x):
            emb, norm = model.apply(variables, x, train=False)
            return emb, norm

        self._embed = _embed

    def embed_crops(self, crops: np.ndarray) -> np.ndarray:
        """[N,112,112,3] BGR uint8 aligned crops -> [N,512] unit-norm
        embeddings, batched through the fixed-size jitted graph."""
        import jax.numpy as jnp

        n = len(crops)
        if n == 0:
            return np.zeros((0, self.model.embedding_size), np.float32)
        # BGR -> RGB + the 0.5/0.5 normalize, fused with contiguous
        # per-channel writes: normalize_face on the ::-1 channel view
        # walks a stride-(-1) inner loop of length 3 — measured 86x
        # slower (3.8 s vs 44 ms on 357 crops; it was the /identify
        # latency floor, not the TPU).
        x = np.empty(crops.shape, np.float32)
        x[..., 0] = crops[..., 2]
        x[..., 1] = crops[..., 1]
        x[..., 2] = crops[..., 0]
        # same op sequence as normalize_face -> bit-identical values
        x /= 255.0
        x -= 0.5
        x /= 0.5
        out = np.zeros((n, self.model.embedding_size), np.float32)
        b = self.embed_batch
        # Pipeline the chunks: dispatch ahead, fetch lagged — a blocking
        # per-chunk fetch serializes one transfer round trip per chunk
        # (23 chunks cost ~2.9 s through the remote tunnel; overlapped
        # they ride one pipe). In-flight depth is capped like the train
        # loop's MAX_IN_FLIGHT (unbounded run-ahead collapses
        # remote-attached throughput).
        pending = []  # (lo, emb_device)

        def drain(keep: int):
            while len(pending) > keep:
                lo, emb = pending.pop(0)
                out[lo : lo + b] = np.asarray(emb)[: n - lo]

        # ONE host->device transfer for all crops (pad the count to a
        # multiple of the static batch), then per-chunk DEVICE-side
        # slices feed the fixed-shape jitted graph — per-chunk host
        # puts cost ~200 ms each through a remote-attached tunnel
        # (23 chunks measured 4.7 s; the bytes themselves are ~1 s).
        # The eager slice keeps _embed at its compiled [b, ...] shape,
        # so crop counts never trigger recompiles.
        n_pad = -(-n // b) * b
        if n_pad > n:
            x = np.concatenate(
                [x, np.zeros((n_pad - n, *x.shape[1:]), x.dtype)]
            )
        x_dev = jnp.asarray(x)
        for lo in range(0, n, b):
            emb, _ = self._embed(self.variables, x_dev[lo : lo + b])
            pending.append((lo, emb))
            drain(keep=4)
        drain(keep=0)
        return out

    def analyze(
        self, image: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """BGR image -> ([N,15] pixel-space dets, [N,512] embeddings)."""
        dets = self.predictor.detect_image(image)
        crops = align_from_detections(image, dets, self.crop_size)
        return dets, self.embed_crops(crops)


class Gallery:
    """Named identity gallery with cosine matching.

    Embeddings are unit-norm (net.py returns l2-normalized features);
    an identity enrolled from several photos stores their re-normalized
    mean — the validation protocols' feature-fusion convention
    (utils.py fuse_features_with_norm averages, then the comparison
    renormalizes)."""

    def __init__(self):
        self.names: List[str] = []
        self._embs: List[np.ndarray] = []

    def enroll(self, name: str, embeddings: np.ndarray):
        e = np.asarray(embeddings, np.float32)
        if e.ndim == 1:
            e = e[None]
        mean = e.mean(axis=0)
        nrm = np.linalg.norm(mean)
        if nrm == 0:
            raise ValueError(f"zero embedding for {name!r}")
        self.names.append(name)
        self._embs.append(mean / nrm)

    @property
    def matrix(self) -> np.ndarray:
        if not self._embs:
            return np.zeros((0, 0), np.float32)
        return np.stack(self._embs)

    def match(
        self, embeddings: np.ndarray, threshold: float = 0.3
    ) -> List[Tuple[Optional[str], float]]:
        """[N,D] query embeddings -> [(best name or None, cosine)]."""
        out: List[Tuple[Optional[str], float]] = []
        g = self.matrix
        for e in np.atleast_2d(np.asarray(embeddings, np.float32)):
            if g.size == 0:
                out.append((None, -1.0))
                continue
            sims = g @ (e / max(np.linalg.norm(e), 1e-12))
            i = int(np.argmax(sims))
            s = float(sims[i])
            out.append((self.names[i] if s >= threshold else None, s))
        return out

    def save(self, path: str):
        np.savez(
            path, names=np.array(self.names, object), embs=self.matrix
        )

    @classmethod
    def load(cls, path: str) -> "Gallery":
        g = cls()
        data = np.load(path, allow_pickle=True)
        g.names = [str(n) for n in data["names"]]
        g._embs = [np.asarray(e, np.float32) for e in data["embs"]]
        return g


def enroll_directory(
    pipeline: FacePipeline, gallery_dir: str, min_score: float = 0.0
) -> Gallery:
    """Build a Gallery from a tree of `<gallery_dir>/<name>/*.jpg`:
    each photo contributes its highest-score detected face."""
    import os

    import cv2

    gallery = Gallery()
    for name in sorted(os.listdir(gallery_dir)):
        person_dir = os.path.join(gallery_dir, name)
        if not os.path.isdir(person_dir):
            continue
        embs = []
        for fn in sorted(os.listdir(person_dir)):
            if not fn.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            img = cv2.imread(os.path.join(person_dir, fn))
            if img is None:
                continue
            dets, e = pipeline.analyze(img)
            if len(dets) == 0 or dets[:, 4].max() < min_score:
                continue
            embs.append(e[int(np.argmax(dets[:, 4]))])
        if embs:
            gallery.enroll(name, np.stack(embs))
    return gallery
