"""Inference: the fused device program + the predict.py app surface.

Reference: predict.py — `Retinaface` class (:24) with `detect_image`
(:115), `get_FPS` (:253), `get_map_txt` (:338) and the driver modes
predict/video/fps/dir_predict (:424-544). There, every image runs
host-side letterbox -> GPU forward -> decode -> torchvision NMS ->
`.cpu().numpy()` -> numpy letterbox-undo.

TPU-native design: ONE jitted graph per (batch, input) shape does
normalize -> backbone -> decode -> score-filter (static top-k) -> greedy
NMS -> letterbox-undo scaling, returning fixed-shape [B, max_out, 15]
detections + validity mask. The only host work is image decode and the
final mask slice. NMS runs as the fused Pallas kernel on TPU and the XLA
reference elsewhere.

Detection row layout (reference get_map_txt parity, predict.py:338-415):
[x1, y1, x2, y2, score, 10 landmark coords] in input-image pixels.
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.ops import anchors as A
from jabd_tpu.ops import boxes as B
from jabd_tpu.ops import image as I
from jabd_tpu.ops import nms as N
from jabd_tpu.ops import nms_pallas as NP


def _use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def postprocess_outputs(
    loc: jnp.ndarray,  # [B, P, 4]
    cls: jnp.ndarray,  # [B, P, 2]
    landm: jnp.ndarray,  # [B, P, 10]
    anchors: jnp.ndarray,  # [P, 4]
    pcfg: configs.PredictConfig,
    variances: Tuple[float, float] = (0.1, 0.2),
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stages 1-3 of the fused graph (decode -> top-k filter -> NMS ->
    compact), factored out of `detect_batch` so serving modes that
    partition the FORWARD differently (spatial partitioning, AOT) can
    reuse the identical postprocess. Returns (dets [B, max_out, 15],
    valid [B, max_out])."""
    scores = cls[..., 1]

    k = min(pcfg.pre_nms_topk, scores.shape[-1])
    max_out = pcfg.max_detections

    # Stage 1 (vmapped): select candidates FIRST, decode only the k
    # winners — decoding all P anchors' boxes+landmarks (14 coords each)
    # dominated the postprocess at large batch. top_k returns candidates
    # sorted by descending score, so greedy NMS consumes them directly.
    def select(lo, sc, lm):
        msc = jnp.where(sc >= pcfg.confidence, sc, N.NEG_INF)
        top_sc, idx = jax.lax.top_k(msc, k)
        valid = top_sc > N.NEG_INF / 2
        cand_anchors = anchors[idx]
        cand_boxes = B.decode(lo[idx], cand_anchors, variances)
        cand_landms = B.decode_landm(lm[idx], cand_anchors, variances)
        return cand_boxes, top_sc, valid, cand_landms

    cand_boxes, top_sc, valid, cand_landms = jax.vmap(select)(
        loc, scores, landm
    )

    # Stage 2: greedy NMS over the whole batch in ONE kernel launch
    # (vmapping the kernel pays per-image dispatch overhead).
    if use_pallas:
        keep = NP.nms_keep_sorted_pallas_batched(
            cand_boxes, valid, pcfg.nms_iou, kind=pcfg.nms_kind
        )
    else:
        keep = jax.vmap(
            lambda b, v: N.nms_keep_sorted(
                b, v, pcfg.nms_iou, kind=pcfg.nms_kind
            )
        )(cand_boxes, valid)

    # Stage 3 (vmapped): compact kept rows (already score-ordered).
    def compact(kp, cb, sc, cl):
        pos = jnp.cumsum(kp) - 1
        in_range = kp & (pos < max_out)
        rows = jnp.concatenate([cb, sc[:, None], cl], axis=-1)  # [k, 15]
        det = jnp.zeros((max_out, 15), rows.dtype)
        det = det.at[jnp.where(in_range, pos, max_out)].set(
            rows, mode="drop"
        )
        out_valid = jnp.arange(max_out) < jnp.sum(in_range)
        return det, out_valid

    return jax.vmap(compact)(keep, cand_boxes, top_sc, cand_landms)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_apply",
        "pcfg",
        "variances",
        "use_pallas",
    ),
)
def detect_batch(
    model_apply,
    variables,
    images: jnp.ndarray,  # [B, H, W, 3] float32, mean-subtracted
    anchors: jnp.ndarray,  # [P, 4]
    pcfg: configs.PredictConfig,
    variances: Tuple[float, float] = (0.1, 0.2),
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The fused graph. Returns (dets [B, max_out, 15], valid [B, max_out]).

    Boxes/landmarks are in NORMALIZED [0,1] input coords — pixel scaling
    and letterbox-undo happen in the thin host wrapper (they depend on the
    original image size, which is per-image host data).
    """
    loc, cls, landm = model_apply(variables, images)
    return postprocess_outputs(
        loc, cls, landm, anchors, pcfg, variances, use_pallas
    )


_letterbox_batch_jit = jax.jit(I.letterbox_batch_device)


def undo_letterbox_pixels(
    dets: np.ndarray,
    input_hw: Tuple[int, int],
    image_hw: Tuple[int, int],
    letterbox: bool = True,
) -> np.ndarray:
    """Normalized letterboxed dets [N, 15] -> original-image pixel coords
    (retinaface_correct_boxes + the predict.py:194-205 scaling). Mutates
    and returns `dets`."""
    if len(dets) == 0:
        return np.zeros((0, 15), np.float32)
    ih, iw = image_hw
    if letterbox:
        (ox, oy), (sx, sy) = I.correct_boxes_scale_offset(
            input_hw, image_hw
        )
        dets[:, [0, 2]] = (dets[:, [0, 2]] - ox) * sx
        dets[:, [1, 3]] = (dets[:, [1, 3]] - oy) * sy
        dets[:, 5::2] = (dets[:, 5::2] - ox) * sx
        dets[:, 6::2] = (dets[:, 6::2] - oy) * sy
    dets[:, [0, 2]] *= iw
    dets[:, [1, 3]] *= ih
    dets[:, 5::2] *= iw
    dets[:, 6::2] *= ih
    return dets


class Predictor:
    """App-level predictor (the reference `Retinaface` class, predict.py:24).

    defaults mirror predict.py:25-60: confidence 0.5, nms_iou 0.45,
    input_shape 1280x1280, letterbox on.
    """

    def __init__(
        self,
        model_cfg: configs.ModelConfig,
        variables,
        predict_cfg: Optional[configs.PredictConfig] = None,
        use_pallas: Optional[bool] = None,
        fold_bn: bool = True,
        mesh=None,
        partition: str = "data",
    ):
        """`mesh`: an optional 1-D `jax.sharding.Mesh` (parallel/mesh.py).
        When given (and larger than one device), batched entry points
        shard across it — the TPU-native replacement for the reference's
        `nn.DataParallel` serving wrap (predict.py:109). Params are
        always replicated. `partition` picks the axis:

        * ``"data"`` (default): the batch axis is sharded; the fused
          detect graph runs under `shard_map` so the Pallas NMS kernel
          executes per-shard (GSPMD can't partition an opaque kernel
          call). Batch sizes must divide the mesh size. Maximizes
          throughput.
        * ``"spatial"``: the image HEIGHT axis is sharded — GSPMD
          spatial partitioning, with XLA inserting the conv halo
          exchanges over ICI automatically. No batch-divisibility
          constraint (batch=1 works), so this is the latency mode for
          large inputs (the 1280x1280 reference eval shape): every chip
          cooperates on every image instead of each chip owning whole
          images. The postprocess (top-k/NMS on <=pre_nms_topk
          candidates) is too small to split and runs replicated on each
          device under shard_map. The input height must divide the mesh
          size. No reference analog (DataParallel only splits batch)."""
        self.mcfg = model_cfg
        self.pcfg = predict_cfg or configs.PredictConfig()
        if fold_bn:
            # Eval-only graph: fold BN into conv weights (models/fold.py).
            # For bf16-compute presets, pre-cast the folded weights — the
            # values are identical to Flax's runtime param cast, but HBM
            # reads half the bytes per step.
            from jabd_tpu.models.fold import fold_batchnorm

            cast = (
                jnp.bfloat16
                if model_cfg.compute_dtype == "bfloat16"
                else None
            )
            variables = fold_batchnorm(variables, cast=cast)
        self.model = build_model(model_cfg, mode="eval")
        self.use_pallas = (
            _use_pallas_default() if use_pallas is None else use_pallas
        )
        self._apply = self._apply_fn  # bound method: stable jit static key
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if partition not in ("data", "spatial"):
            raise ValueError(
                f"partition must be 'data' or 'spatial', got {partition!r}"
            )
        self.partition = partition
        self._sharded_detect = None
        self._spatial_detect = None
        self.variables = self._place_variables(variables)

    def _place_variables(self, variables):
        if self.mesh is not None:
            from jabd_tpu.parallel import mesh as M

            return M.replicate_tree(variables, self.mesh)
        return variables

    def quantize_int8(
        self,
        sample_images: np.ndarray,
        search_clip: bool = False,
        score_fn=None,
    ) -> int:
        """Switch serving to the int8 path (models/quantize.py): folded
        non-depthwise ConvBNs run as int8 MXU convs (2x the bf16 MXU
        rate on v5e, half the weight/activation HBM bytes). Activation
        scales are calibrated on `sample_images` ([N, H, W, 3] uint8 or
        float RGB) pushed through the same preprocessing as serving.
        `search_clip=True` additionally grid-searches a global clip
        ratio below absmax, scored by end-to-end output error on the
        same samples (models/quantize.py::search_clip_ratio) — or by
        `score_fn(candidate_variables) -> float` (lower better) when
        given, e.g. negative AP through the WIDER evaluator.
        Returns the number of quantized conv sites. Requires fold_bn
        (the default ctor path). No reference analog (predict.py serves
        fp32 torch)."""
        from jabd_tpu.models.quantize import (
            calibrate,
            quantize_variables,
            search_clip_ratio,
        )
        from jabd_tpu.ops.image import preprocess_input_np

        th, tw = self.pcfg.input_shape
        # EXACTLY the serving recipe (detect_image/get_fps): letterbox
        # in the sample's native dtype, then float. A uint8 coercion
        # here would truncate float samples (a [0,1]-normalized image
        # becomes all-black) and calibrate on frames serving never sees.
        imgs = np.stack(
            [
                I.letterbox_np(np.asarray(im), (tw, th)).astype(np.float32)
                for im in sample_images
            ]
        )
        x = jnp.asarray(preprocess_input_np(imgs))
        calib = calibrate(self.model, self.variables, [x])
        ratio = 1.0
        if search_clip:
            ratio, _ = search_clip_ratio(
                self.model, self.variables, calib, [x], score_fn=score_fn
            )
        variables, n = quantize_variables(
            self.variables, calib, clip_ratio=ratio
        )
        self.variables = self._place_variables(variables)
        return n

    def _apply_fn(self, variables, images):
        return self.model.apply(variables, images, train=False)

    def _anchors_for(self, hw: Tuple[int, int]) -> jnp.ndarray:
        return jnp.asarray(A.generate_anchors(self.mcfg.anchors, hw))

    def _sharded_detect_fn(self):
        """jit(shard_map(detect graph)) over the data axis — built once.

        shard_map (not bare jit-with-shardings) because the Pallas NMS
        kernel is an opaque custom call GSPMD can't split; inside
        shard_map each device runs the whole graph on its local batch
        shard, which is exactly DataParallel's semantics."""
        if self._sharded_detect is None:
            from jax.sharding import PartitionSpec as P

            from jabd_tpu.parallel.mesh import DATA_AXIS

            def core(variables, images, anchors):
                return detect_batch(
                    self._apply,
                    variables,
                    images,
                    anchors,
                    self.pcfg,
                    variances=self.mcfg.anchors.variance,
                    use_pallas=self.use_pallas,
                )

            self._sharded_detect = jax.jit(
                jax.shard_map(
                    core,
                    mesh=self.mesh,
                    in_specs=(P(), P(DATA_AXIS), P()),
                    out_specs=P(DATA_AXIS),
                    # the body is per-sample compute only (no collectives);
                    # vma checking rejects the Pallas call, disable it
                    check_vma=False,
                )
            )
        return self._sharded_detect

    def _spatial_detect_fn(self):
        """jit with GSPMD SPATIAL partitioning — built once.

        The image height axis carries the sharding; a
        with_sharding_constraint on the input is the only annotation,
        and XLA's SPMD partitioner propagates it through the conv
        stack, inserting the halo exchanges (and the gathers the
        global-context ops — NLM attention, matmul resize — need)
        automatically. Head outputs are constrained back to replicated
        and the postprocess runs per-device under an all-replicated
        shard_map, which keeps the opaque Pallas NMS call legal on a
        >1-device mesh (same reason as _sharded_detect_fn)."""
        if self._spatial_detect is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from jabd_tpu.parallel.mesh import DATA_AXIS

            mesh = self.mesh
            sp = NamedSharding(mesh, P(None, DATA_AXIS))
            rep = NamedSharding(mesh, P())

            def post(loc, cls, landm, anchors):
                return postprocess_outputs(
                    loc,
                    cls,
                    landm,
                    anchors,
                    self.pcfg,
                    variances=self.mcfg.anchors.variance,
                    use_pallas=self.use_pallas,
                )

            def core(variables, images, anchors):
                images = jax.lax.with_sharding_constraint(images, sp)
                loc, cls, landm = self._apply(variables, images)
                loc, cls, landm = jax.tree_util.tree_map(
                    lambda t: jax.lax.with_sharding_constraint(t, rep),
                    (loc, cls, landm),
                )
                return jax.shard_map(
                    post,
                    mesh=mesh,
                    in_specs=(P(), P(), P(), P()),
                    out_specs=P(),
                    check_vma=False,
                )(loc, cls, landm, anchors)

            self._spatial_detect = jax.jit(core)
        return self._spatial_detect

    def _detect_core(self, images: jnp.ndarray, hw: Tuple[int, int]):
        """Dispatch a mean-subtracted [B, *hw, 3] device batch through the
        fused graph — sharded over `self.mesh` when one was given."""
        anchors = self._anchors_for(hw)
        if self.mesh is not None and self.partition == "spatial":
            from jax.sharding import NamedSharding, PartitionSpec as P

            from jabd_tpu.parallel import mesh as M
            from jabd_tpu.parallel.mesh import DATA_AXIS

            h = images.shape[1]
            if h % self.mesh.size:
                raise ValueError(
                    f"input height {h} must divide the serving mesh size "
                    f"{self.mesh.size} for spatial partitioning"
                )
            images = jax.device_put(
                images, NamedSharding(self.mesh, P(None, DATA_AXIS))
            )
            anchors = jax.device_put(anchors, M.replicate(self.mesh))
            return self._spatial_detect_fn()(
                self.variables, images, anchors
            )
        if self.mesh is not None:
            from jabd_tpu.parallel import mesh as M

            b = images.shape[0]
            if b % self.mesh.size:
                raise ValueError(
                    f"batch size {b} must divide the serving mesh size "
                    f"{self.mesh.size} (pad the batch or shrink the mesh)"
                )
            images = jax.device_put(images, M.batch_sharding(self.mesh))
            anchors = jax.device_put(anchors, M.replicate(self.mesh))
            return self._sharded_detect_fn()(
                self.variables, images, anchors
            )
        return detect_batch(
            self._apply,
            self.variables,
            images,
            anchors,
            self.pcfg,
            variances=self.mcfg.anchors.variance,
            use_pallas=self.use_pallas,
        )

    # -- core entry points --------------------------------------------------

    def detect_preprocessed(self, images: np.ndarray):
        """images: [B, H, W, 3] float32 already mean-subtracted. Returns
        (dets [B, max_out, 15] normalized, valid [B, max_out])."""
        hw = images.shape[1:3]
        return self._detect_core(jnp.asarray(images), tuple(hw))

    def detect_images(self, images) -> list:
        """Batched detection over ARBITRARY-SIZED uint8 images with ONE
        compiled graph: per-image letterbox runs on-device as per-sample
        resample matrices against a static source bucket
        (ops/image.py::plan_letterbox), fused with the model + NMS.

        The reference serves dir_predict one image at a time through a
        host cv2 letterbox (predict.py:527-544); this path batches
        mixed-resolution inputs without per-size recompiles. Pixels
        differ from the byte-exact host letterbox only by cv2's uint8
        fixed-point rounding. Returns a list of [N_i, 15] pixel-space
        dets.
        """
        if not len(images):
            return []
        th, tw = self.pcfg.input_shape
        bh = max(i.shape[0] for i in images)
        bw = max(i.shape[1] for i in images)
        # Bucket to a lane-friendly size (and cap: larger sources are
        # pre-shrunk — detail past the letterbox target is lost anyway).
        bh = min(-(-bh // 128) * 128, 2048)
        bw = min(-(-bw // 128) * 128, 2048)

        padded, parts = zip(
            *(
                I.plan_letterbox(
                    im, (th, tw), (bh, bw), letterbox=self.pcfg.letterbox
                )
                for im in images
            )
        )
        mv, mh, iv, ih_ = (np.stack(p) for p in zip(*parts))
        lb_in = [
            jnp.asarray(np.stack(padded)),
            jnp.asarray(mv),
            jnp.asarray(mh),
            jnp.asarray(iv),
            jnp.asarray(ih_),
        ]
        if (
            self.mesh is not None
            and self.partition == "data"
            and len(images) % self.mesh.size == 0
        ):
            # Shard the letterbox inputs too: the per-sample resample
            # einsums partition cleanly under GSPMD (no Pallas inside),
            # and the frames arrive already laid out for _detect_core.
            from jabd_tpu.parallel import mesh as M

            sh = M.batch_sharding(self.mesh)
            lb_in = [jax.device_put(x, sh) for x in lb_in]
        frames = _letterbox_batch_jit(*lb_in)
        dets_b, valid_b = self._detect_core(frames, (th, tw))
        out = []
        for i, image in enumerate(images):
            dets = np.asarray(dets_b[i])[np.asarray(valid_b[i])]
            out.append(
                undo_letterbox_pixels(
                    dets, (th, tw), image.shape[:2], self.pcfg.letterbox
                )
            )
        return out

    def detect_image(self, image: np.ndarray) -> np.ndarray:
        """Single [H, W, 3] uint8/float image -> [N, 15] pixel-space dets
        (x1 y1 x2 y2 score lmk...), like get_map_txt (predict.py:338-415)."""
        ih, iw = image.shape[:2]
        th, tw = self.pcfg.input_shape
        x = I.serving_front_end(
            image, (tw, th), self.pcfg.letterbox
        )[None]
        dets, valid = self.detect_preprocessed(x)
        dets = np.asarray(dets[0])[np.asarray(valid[0])]
        return undo_letterbox_pixels(
            dets, (th, tw), (ih, iw), self.pcfg.letterbox
        )

    def detect_multiscale(
        self, image: np.ndarray, scales=(0.5, 1.0, 1.5)
    ) -> np.ndarray:
        """Bicubic image-pyramid evaluation (BASELINE config #5): detect at
        several letterbox resolutions, merge, and re-run NMS on the union."""
        import cv2

        all_dets = []
        for s in scales:
            ih, iw = image.shape[:2]
            scaled = cv2.resize(
                image.astype(np.float32),
                (max(int(iw * s), 32), max(int(ih * s), 32)),
                interpolation=cv2.INTER_CUBIC,
            )
            d = self.detect_image(scaled)
            if len(d):
                d[:, [0, 2]] *= iw / scaled.shape[1]
                d[:, [1, 3]] *= ih / scaled.shape[0]
                d[:, 5::2] *= iw / scaled.shape[1]
                d[:, 6::2] *= ih / scaled.shape[0]
                all_dets.append(d)
        if not all_dets:
            return np.zeros((0, 15), np.float32)
        merged = np.concatenate(all_dets, 0)
        # Host numpy NMS: the merged count varies per image, so the jitted
        # kernel would recompile per unique N.
        keep = N.nms_numpy(
            merged[:, :4], merged[:, 4], iou_threshold=self.pcfg.nms_iou
        )[: self.pcfg.max_detections]
        return merged[keep]

    def get_fps(
        self,
        image: np.ndarray,
        test_interval: int = 100,
        method: str = "chained",
    ) -> float:
        """FPS of the fused forward+decode+NMS graph (predict.py:253-333).

        method='chained' (default) chains the iterations inside one
        jitted fori_loop with value dependencies and fetches once
        (utils/profiling.chained_benchmark) — honest even on backends
        whose block_until_ready returns before execution completes (the
        remote-tunneled TPU here reported 37,000 "img/s" from the
        wall-clock loop). method='wall' keeps the reference-parity
        dispatch-loop harness for directly-attached hardware.
        """
        th, tw = self.pcfg.input_shape
        x = I.preprocess_input_np(
            I.letterbox_np(image, (tw, th)).astype(np.float32)
        )[None]
        xj = jnp.asarray(x)
        anchors = self._anchors_for((th, tw))

        def run(imgs, variables=None, anc=None):
            return detect_batch(
                self._apply,
                self.variables if variables is None else variables,
                imgs,
                anchors if anc is None else anc,
                self.pcfg,
                variances=self.mcfg.anchors.variance,
                use_pallas=self.use_pallas,
            )

        if method == "chained":
            from jabd_tpu.utils.profiling import chained_benchmark

            # Pass the params + anchors THROUGH the chained harness's
            # input pytree (its documented contract): closed-over
            # arrays embed as HLO constants, which both bloats the
            # upload past the remote compiler's ~100 MB cap on the
            # large presets (raw152: ~240 MB f32) and re-opens the
            # constant-folding fantasy-timing trap (CLAUDE.md).
            r = chained_benchmark(
                lambda inp: run(inp[0], inp[1], inp[2]),
                (xj, self.variables, anchors),
                iters=test_interval,
            )
            return 1.0 / r["per_iter_s"]

        out = run(xj)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.time()
        for _ in range(test_interval):
            out = run(xj)
        jax.block_until_ready(out)
        return test_interval / (time.time() - t0)

    def get_map_txt_rows(self, image: np.ndarray) -> np.ndarray:
        """Rows for the WIDER evaluator: x y w h score (utils_map format)."""
        d = self.detect_image(image)
        if len(d) == 0:
            return np.zeros((0, 5), np.float32)
        out = np.stack(
            [
                d[:, 0],
                d[:, 1],
                d[:, 2] - d[:, 0],
                d[:, 3] - d[:, 1],
                d[:, 4],
            ],
            axis=1,
        )
        return out[np.argsort(-out[:, 4], kind="stable")]
