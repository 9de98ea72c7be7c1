"""Detection serving daemon: dynamic batching over the fused graph.

The reference's deployment story is a Python script looping
`detect_image` one frame at a time (predict.py:424-544). A TPU serves
economically only when requests ride one compiled fixed-shape batched
graph — so this module adds the missing production surface:

- `BatchingDetector`: a request queue + collector thread that coalesces
  concurrent single-image requests into fixed-size device batches
  (pad-to-batch, one XLA program, no recompiles), then fans results
  back out per request. Works over a live `Predictor` (optionally
  mesh-sharded) or a loaded AOT artifact (`aot.AotDetector`) — both
  expose the same `detect_preprocessed` contract.
- `serve()`: a stdlib ThreadingHTTPServer speaking JSON:
    POST /detect   image bytes (jpg/png/...) -> {"faces": [[x1,y1,x2,y2,
                   score, lmk x 10], ...]}
    POST /identify (when started with an embedder) -> faces + unit-norm
                   embeddings + gallery names/cosines; detection rides
                   the same shared device batches as /detect, then the
                   aligned crops embed through the pipeline's
                   fixed-batch jitted IR graph (jabd_tpu/pipeline.py)
    GET  /healthz  {"requests": N, "batches": M, "occupancy": avg}

Every request takes exactly the single-image `detect_image` path
numerically (host letterbox -> fused detect -> letterbox undo), so
serving results are bit-identical to the CLI — batching changes
latency/throughput, never outputs.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np

from jabd_tpu.ops import image as I
from jabd_tpu.predict import undo_letterbox_pixels


class BatchingDetector:
    """Coalesce concurrent detect requests into fixed-size batches.

    `backend` is a Predictor or AotDetector; `batch_size` must match an
    AotDetector's exported batch (a Predictor compiles once for the
    given size). `max_wait_ms` bounds the latency cost of waiting for
    batch-mates after the first request arrives.
    """

    def __init__(
        self,
        backend,
        batch_size: int = 8,
        max_wait_ms: float = 15.0,
        input_shape: Optional[Tuple[int, int]] = None,
        letterbox: Optional[bool] = None,
    ):
        self.backend = backend
        self.batch_size = int(batch_size)
        aot_batch = getattr(backend, "batch_size", None)
        if aot_batch is not None and aot_batch != self.batch_size:
            raise ValueError(
                f"AOT artifact serves batch {aot_batch}; start the "
                f"server with --batch-size {aot_batch}"
            )
        mesh = getattr(backend, "mesh", None)
        # Only the data partition shards the batch axis (spatial shards
        # height and takes any batch size, including 1).
        if (
            mesh is not None
            and getattr(backend, "partition", "data") == "data"
            and self.batch_size % mesh.size
        ):
            raise ValueError(
                f"batch size {self.batch_size} must divide the serving "
                f"mesh size {mesh.size}"
            )
        self.max_wait_s = max_wait_ms / 1000.0
        pcfg = getattr(backend, "pcfg", None)
        self.input_shape = tuple(
            input_shape
            or (pcfg.input_shape if pcfg else backend.input_shape)
        )
        self.letterbox = bool(
            letterbox
            if letterbox is not None
            else (pcfg.letterbox if pcfg else backend.letterbox)
        )
        self._q: "queue.Queue" = queue.Queue()
        self._stats_lock = threading.Lock()
        self.n_requests = 0
        self.n_batches = 0
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side --------------------------------------------------------

    def detect(self, image: np.ndarray, timeout: float = 600.0):
        """Blocking single-image detect ([H, W, 3] uint8 BGR) ->
        [N, 15] pixel-space dets. Thread-safe; concurrent callers share
        device batches. The default timeout covers the FIRST request's
        XLA compile (minutes on remote-attached TPUs); steady-state
        requests return in one batch period."""
        fut: Future = Future()
        self._q.put((image, fut))
        return fut.result(timeout=timeout)

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the collector
        self._worker.join(timeout=5)

    def stats(self) -> dict:
        with self._stats_lock:
            return {
                "requests": self.n_requests,
                "batches": self.n_batches,
                "batch_size": self.batch_size,
                "occupancy": (
                    self.n_requests / (self.n_batches or 1)
                ),
                "input_shape": list(self.input_shape),
            }

    # -- collector ----------------------------------------------------------

    def _collect(self) -> List[Tuple[np.ndarray, Future]]:
        """Block for the first request, then gather batch-mates until the
        batch fills or max_wait elapses."""
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _run(self):
        th, tw = self.input_shape
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            try:
                batch = np.zeros(
                    (self.batch_size, th, tw, 3), np.float32
                )
                for i, (img, _) in enumerate(items):
                    # The exact detect_image front-end (one shared
                    # definition: ops/image.serving_front_end).
                    batch[i] = I.serving_front_end(
                        img, (tw, th), self.letterbox
                    )
                dets_b, valid_b = self.backend.detect_preprocessed(batch)
                dets_b = np.asarray(dets_b)
                valid_b = np.asarray(valid_b)
                for i, (img, fut) in enumerate(items):
                    dets = dets_b[i][valid_b[i]]
                    fut.set_result(
                        undo_letterbox_pixels(
                            dets, (th, tw), img.shape[:2], self.letterbox
                        )
                    )
            except Exception as e:  # pragma: no cover - defensive
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
            with self._stats_lock:
                self.n_requests += len(items)
                self.n_batches += 1


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib only)
# ---------------------------------------------------------------------------


class IdentityService:
    """Optional /identify extension: align each request's detections and
    embed them through a FacePipeline's fixed-batch jitted graph; name
    them when a Gallery is attached. Detection itself stays on the
    BatchingDetector's shared device batches — only the (much cheaper,
    112²) embedding runs per-request on the handler thread."""

    def __init__(self, pipeline, gallery=None, threshold: float = 0.3):
        self.pipeline = pipeline
        self.gallery = gallery
        self.threshold = threshold

    def analyze(self, image: np.ndarray, dets: np.ndarray) -> list:
        from jabd_tpu.recognition.align import align_from_detections

        crops = align_from_detections(
            image, dets, self.pipeline.crop_size
        )
        embs = self.pipeline.embed_crops(crops)
        matches = (
            self.gallery.match(embs, threshold=self.threshold)
            if self.gallery is not None and len(embs)
            else [(None, -1.0)] * len(embs)
        )
        return [
            {
                "box": [round(float(v), 3) for v in d[:4]],
                "score": round(float(d[4]), 4),
                "landmarks": [round(float(v), 3) for v in d[5:15]],
                "name": name,
                "cosine": round(float(sim), 4),
                "embedding": np.round(e.astype(np.float64), 6).tolist(),
            }
            for d, e, (name, sim) in zip(dets, embs, matches)
        ]


def make_server(
    detector: BatchingDetector,
    host="127.0.0.1",
    port=8712,
    identity: Optional[IdentityService] = None,
):
    """Build (don't start) the ThreadingHTTPServer — separable for tests.
    Concurrent HTTP handler threads feed the one BatchingDetector, which
    is what actually forms device batches."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, detector.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/identify" and identity is None:
                self._json(
                    503,
                    {"error": "no embedder: start the server with "
                              "--arch/--ckpt to enable /identify"},
                )
                return
            if self.path not in ("/detect", "/identify"):
                self._json(404, {"error": "unknown path"})
                return
            import cv2

            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            img = cv2.imdecode(
                np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR
            )
            if img is None:
                self._json(400, {"error": "undecodable image"})
                return
            try:
                dets = detector.detect(img)
                if self.path == "/identify":
                    faces = identity.analyze(img, dets)
                    self._json(200, {"faces": faces, "count": len(faces)})
                    return
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            self._json(
                200,
                {
                    "faces": [[round(float(v), 3) for v in d] for d in dets],
                    "count": int(len(dets)),
                },
            )

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    detector: BatchingDetector,
    host="127.0.0.1",
    port=8712,
    identity: Optional[IdentityService] = None,
):
    srv = make_server(detector, host, port, identity=identity)
    print(
        f"serving on http://{host}:{srv.server_address[1]} "
        f"(batch {detector.batch_size}, input {detector.input_shape}"
        f"{', /identify enabled' if identity else ''})"
    )
    try:
        srv.serve_forever()
    finally:
        detector.close()
