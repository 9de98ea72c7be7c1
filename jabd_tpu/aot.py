"""Ahead-of-time serving artifacts (`jax.export` / StableHLO).

The reference deploys by shipping Python source + a `.pth` and rebuilding
the torch module graph at load time (predict.py:97-110). A TPU-native
production path wants neither Python model code nor retracing on the
serving host: this module serializes the ENTIRE fused detect graph
(normalize -> backbone -> decode -> top-k -> NMS, anchors folded in) to a
versioned StableHLO artifact plus a params blob. The serving host
deserializes and calls — no flax, no model registry, no trace; the
artifact is also a compatibility contract (jax.export guarantees forward
compatibility windows for serialized modules).

Artifacts are cross-built: a CPU-only host can emit TPU artifacts
(platforms=("tpu",) lowers the Pallas NMS kernel to Mosaic without a TPU
attached). Layout:

    <dir>/graph.jaxexport   serialized jax.export module
    <dir>/params.msgpack    flax-serialized variables (folded, cast)
    <dir>/manifest.json     shapes, postprocess config, platforms
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs

ARTIFACT_VERSION = 1
_GRAPH = "graph.jaxexport"
_PARAMS = "params.msgpack"
_MANIFEST = "manifest.json"


def _shape_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree
    )


def export_detector(
    predictor,
    out_dir: str,
    batch_size: int = 1,
    platforms: Sequence[str] = ("tpu",),
    use_pallas: Optional[bool] = None,
    model_name: str = "",
) -> str:
    """Export `predictor`'s fused detect graph for `batch_size` inputs.

    The exported callable is `fn(variables, images)` with images
    [batch, *pcfg.input_shape, 3] float32 mean-subtracted; anchors are
    folded in as a constant (they depend only on config + input shape).
    Params ship separately (keeping them out of the graph bytes — large
    models would otherwise bloat/break module serialization).

    `use_pallas=None` resolves to the Pallas NMS kernel iff exporting
    exclusively for TPU; a multi-platform artifact must use the XLA NMS
    (one serialized graph cannot switch kernels per platform).
    """
    from flax import serialization

    from jabd_tpu.predict import detect_batch

    if predictor.mesh is not None:
        raise ValueError(
            "export a single-device Predictor (mesh serving wraps "
            "shard_map around this same graph at load time)"
        )
    platforms = tuple(platforms)
    if use_pallas is None:
        use_pallas = platforms == ("tpu",)
    if use_pallas and platforms != ("tpu",):
        raise ValueError(
            "the Pallas NMS kernel only lowers for platforms=('tpu',); "
            "use use_pallas=False for multi-platform artifacts"
        )

    th, tw = predictor.pcfg.input_shape
    anchors = predictor._anchors_for((th, tw))

    def fn(variables, images):
        return detect_batch(
            predictor._apply,
            variables,
            images,
            anchors,
            predictor.pcfg,
            variances=predictor.mcfg.anchors.variance,
            use_pallas=use_pallas,
        )

    exp = jax.export.export(jax.jit(fn), platforms=platforms)(
        _shape_tree(predictor.variables),
        jax.ShapeDtypeStruct((batch_size, th, tw, 3), jnp.float32),
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _GRAPH), "wb") as f:
        f.write(exp.serialize())
    host_vars = jax.device_get(predictor.variables)
    with open(os.path.join(out_dir, _PARAMS), "wb") as f:
        f.write(serialization.msgpack_serialize(host_vars))
    manifest = {
        "version": ARTIFACT_VERSION,
        "kind": "detector",
        "model": model_name,
        "batch_size": batch_size,
        "input_shape": [th, tw],
        "platforms": list(platforms),
        "use_pallas": use_pallas,
        "pcfg": {
            "confidence": predictor.pcfg.confidence,
            "nms_iou": predictor.pcfg.nms_iou,
            "nms_kind": predictor.pcfg.nms_kind,
            "letterbox": predictor.pcfg.letterbox,
            "max_detections": predictor.pcfg.max_detections,
            "pre_nms_topk": predictor.pcfg.pre_nms_topk,
        },
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


class AotDetector:
    """Serving-side twin of `Predictor`, driven purely by an artifact dir
    — no model build, no preset registry, no flax.

    With `mesh` (a 1-D data mesh), the serialized graph runs per-shard
    under shard_map: the artifact's batch becomes the PER-CHIP batch and
    `detect_preprocessed` takes batch = artifact_batch * mesh.size (the
    StableHLO module is shape-monomorphic, so each shard invokes it at
    exactly the exported batch)."""

    def __init__(self, exported, variables, manifest: dict, mesh=None):
        self._exported = exported
        self.manifest = manifest
        self.batch_size = int(manifest["batch_size"])
        self.input_shape = tuple(manifest["input_shape"])
        self.letterbox = bool(manifest["pcfg"]["letterbox"])
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from jabd_tpu.parallel import mesh as M

            variables = M.replicate_tree(variables, self.mesh)
            self.batch_size *= self.mesh.size
            self._fn = jax.jit(
                jax.shard_map(
                    exported.call,
                    mesh=self.mesh,
                    in_specs=(P(), P(M.DATA_AXIS)),
                    out_specs=P(M.DATA_AXIS),
                    check_vma=False,
                )
            )
        else:
            self._fn = jax.jit(exported.call)
        self.variables = variables

    def detect_preprocessed(self, images: np.ndarray):
        """images: [batch_size, th, tw, 3] float32 mean-subtracted ->
        (dets [B, max_out, 15] normalized, valid [B, max_out])."""
        b = images.shape[0]
        if b != self.batch_size:
            raise ValueError(
                f"artifact was exported for batch {self.batch_size}, "
                f"got {b}"
            )
        imgs = jnp.asarray(images)
        if self.mesh is not None:
            from jabd_tpu.parallel import mesh as M

            imgs = jax.device_put(imgs, M.batch_sharding(self.mesh))
        return self._fn(self.variables, imgs)

    def detect_image(self, image: np.ndarray) -> np.ndarray:
        """Single [H, W, 3] uint8/float image -> [N, 15] pixel dets (the
        Predictor.detect_image contract). Pads to the artifact batch."""
        from jabd_tpu.ops import image as I
        from jabd_tpu.predict import undo_letterbox_pixels

        th, tw = self.input_shape
        x = I.serving_front_end(image, (tw, th), self.letterbox)[None]
        if self.batch_size > 1:
            x = np.concatenate(
                [x, np.zeros((self.batch_size - 1, *x.shape[1:]), x.dtype)]
            )
        dets, valid = self.detect_preprocessed(x)
        dets = np.asarray(dets[0])[np.asarray(valid[0])]
        return undo_letterbox_pixels(
            dets, (th, tw), image.shape[:2], self.letterbox
        )


def export_embedder(
    model,
    variables,
    out_dir: str,
    batch_size: int = 256,
    image_size: int = 112,
    platforms: Sequence[str] = ("tpu",),
    model_name: str = "",
) -> str:
    """Export a recognition IR backbone's embedding graph:
    fn(variables, images[B, S, S, 3] float32) -> (emb [B, 512], norm).
    Reference serving loads torch modules per host (net.py:14)."""
    from flax import serialization

    def fn(v, x):
        return model.apply(v, x, train=False)

    exp = jax.export.export(jax.jit(fn), platforms=tuple(platforms))(
        _shape_tree(variables),
        jax.ShapeDtypeStruct(
            (batch_size, image_size, image_size, 3), jnp.float32
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _GRAPH), "wb") as f:
        f.write(exp.serialize())
    with open(os.path.join(out_dir, _PARAMS), "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(variables)))
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(
            {
                "version": ARTIFACT_VERSION,
                "kind": "embedder",
                "model": model_name,
                "batch_size": batch_size,
                "input_shape": [image_size, image_size],
                "platforms": list(platforms),
            },
            f,
            indent=1,
        )
    return out_dir


class AotEmbedder:
    def __init__(self, exported, variables, manifest: dict):
        self._fn = jax.jit(exported.call)
        self.variables = variables
        self.manifest = manifest
        self.batch_size = int(manifest["batch_size"])

    def embed(self, images: np.ndarray):
        """[batch_size, S, S, 3] float32 (already normalized) ->
        (embeddings [B, 512], norms [B, 1])."""
        if images.shape[0] != self.batch_size:
            raise ValueError(
                f"artifact batch is {self.batch_size}, got "
                f"{images.shape[0]}"
            )
        return self._fn(self.variables, jnp.asarray(images))


def load_exported(out_dir: str, mesh=None):
    """Load an artifact dir -> AotDetector or AotEmbedder (per manifest).

    `mesh` (detector only): serve the artifact data-parallel — the
    exported batch becomes the per-chip batch (see AotDetector).
    Fails loudly if the current backend is not among the artifact's
    platforms (e.g. a tpu-only Pallas artifact on a CPU host)."""
    from flax import serialization

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["version"] > ARTIFACT_VERSION:
        raise ValueError(
            f"artifact version {manifest['version']} is newer than this "
            f"loader ({ARTIFACT_VERSION})"
        )
    with open(os.path.join(out_dir, _GRAPH), "rb") as f:
        exported = jax.export.deserialize(f.read())
    backend = jax.default_backend()
    # jax.default_backend() says 'gpu' where jax.export platforms say
    # 'cuda'/'rocm' — normalize so a matching GPU artifact isn't
    # spuriously rejected (latent here: this repo emits tpu/cpu).
    aliases = {backend} | ({"cuda", "rocm"} if backend == "gpu" else set())
    if not aliases & set(exported.platforms):
        raise ValueError(
            f"artifact was exported for {exported.platforms}, but the "
            f"current backend is {backend!r}"
        )
    with open(os.path.join(out_dir, _PARAMS), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    if manifest["kind"] == "detector":
        return AotDetector(exported, variables, manifest, mesh=mesh)
    if mesh is not None:
        raise ValueError("mesh serving is only wired for detector artifacts")
    return AotEmbedder(exported, variables, manifest)
