"""Command-line interface.

The reference has NO unified CLI — experiments are separate hard-coded
script files and predict.py's mode switch (predict.py:424-544: `predict`,
`video`, `fps`, `dir_predict`) plus count_param.py. This CLI covers all
of those surfaces over the preset registry:

  python -m jabd_tpu.cli predict  --model jabd_flagship --image img.jpg
  python -m jabd_tpu.cli dir-predict --model ... --input-dir d/ --out o/
  python -m jabd_tpu.cli video    --model ... [--video path|camera index]
  python -m jabd_tpu.cli fps      --model ... --image img.jpg
  python -m jabd_tpu.cli count    --model jabd_flagship [--size 640]
  python -m jabd_tpu.cli map-txt  --model ... --val-dir widerval/ --out p/
  python -m jabd_tpu.cli eval     --pred-dir p/ --gt-dir gt/
  python -m jabd_tpu.cli train    --model jabd_flagship --label-txt l.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _get_config(name):
    from jabd_tpu import configs

    try:
        return configs.get_model_config(name)
    except KeyError as e:
        sys.exit(str(e.args[0]) if e.args else str(e))


def _load_variables(args, mcfg, input_size):
    """Model variables from --weights: a torch .pth (family-dispatched
    converter), an orbax checkpoint dir, or random init."""
    import jax
    import jax.numpy as jnp

    from jabd_tpu.models import build_model

    model = build_model(mcfg, mode="eval")
    shape = (1, input_size, input_size, 3)
    if args.weights:
        from jabd_tpu.utils.torch_convert import (
            convert_state_dict_auto,
            load_pth,
        )

        if args.weights.endswith(".pth") or args.weights.endswith(".tar"):
            # Converter choice follows the preset's backbone family
            # (mnet025 / flagship mnv3 / resnet / epsa naming schemes).
            params, stats = convert_state_dict_auto(
                load_pth(args.weights), mcfg
            )
            variables = {"params": params, "batch_stats": stats}
        else:  # orbax checkpoint dir (cli train's CheckpointManager)
            import orbax.checkpoint as ocp

            path = os.path.abspath(args.weights)
            # Accept <ckpt-dir>/<step>/default, <ckpt-dir>/<step>, or a
            # raw variables dir.
            if os.path.isdir(os.path.join(path, "default")):
                path = os.path.join(path, "default")
            ckpt = ocp.StandardCheckpointer()
            restored = ckpt.restore(path)
            if "params" in restored:
                # TrainState payload: keep only the model collections
                # (opt_state/step are not flax variable collections).
                variables = {"params": restored["params"]}
                if restored.get("batch_stats"):
                    variables["batch_stats"] = restored["batch_stats"]
            else:
                variables = restored
    else:
        print("[warn] no --weights: random init", file=sys.stderr)
        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32)
        )
    return variables


def _load_predictor(args):
    from jabd_tpu import configs
    from jabd_tpu.predict import Predictor

    # Flag validation BEFORE the (expensive) model build.
    if getattr(args, "spatial", False) and getattr(
        args, "data_parallel", False
    ):
        raise SystemExit(
            "--spatial and --data-parallel are mutually exclusive "
            "(one mesh axis: pick batch- or height-sharding)"
        )
    mcfg = _get_config(args.model)
    variables = _load_variables(args, mcfg, args.input_size)
    pcfg = configs.PredictConfig(
        confidence=args.confidence,
        nms_iou=args.nms_iou,
        input_shape=(args.input_size, args.input_size),
    )
    mesh = None
    partition = "data"
    if getattr(args, "spatial", False):
        # Spatial partitioning: every chip cooperates on every image
        # (height axis sharded, conv halos over ICI) — the latency mode.
        from jabd_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        partition = "spatial"
        if mesh.size > 1:
            print(
                f"[mesh] forward spatially partitioned over {mesh.size} "
                "devices",
                file=sys.stderr,
            )
    elif getattr(args, "data_parallel", False):
        # Shard serving batches over every local chip (the reference's
        # nn.DataParallel wrap, predict.py:109, as a shard_map mesh).
        from jabd_tpu.parallel.mesh import make_mesh_for_batch

        mesh = make_mesh_for_batch(max(getattr(args, "batch_size", 1), 1))
        if mesh.size > 1:
            print(
                f"[mesh] serving sharded over {mesh.size} devices",
                file=sys.stderr,
            )
    return Predictor(mcfg, variables, pcfg, mesh=mesh, partition=partition)


def _draw(image, dets):
    import cv2

    img = image.copy()
    for d in dets:
        x1, y1, x2, y2 = (int(v) for v in d[:4])
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 2)
        cv2.putText(
            img, f"{d[4]:.2f}", (x1, max(y1 - 3, 0)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 255, 255), 1,
        )
        for p in range(5):
            cv2.circle(
                img,
                (int(d[5 + 2 * p]), int(d[6 + 2 * p])),
                1,
                (0, 255, 0),
                2,
            )
    return img


def _imread(path):
    import cv2

    img = cv2.imread(path)
    if img is None:
        sys.exit(f"error: cannot read image {path!r}")
    return img


def cmd_export(args):
    """Serialize the fused detect graph + params to an AOT serving
    artifact (jabd_tpu/aot.py). Cross-builds: a CPU host can emit
    TPU artifacts (the Pallas NMS lowers to Mosaic without a chip)."""
    from jabd_tpu.aot import export_detector

    pred = _load_predictor(args)
    if args.quantize == "int8":
        # The artifact captures the int8 graph: quantize the predictor
        # first, calibrated on real images.
        import cv2

        if not args.calib_images:
            sys.exit(
                "--quantize int8 export needs --calib-images <dir> "
                "(a few representative images to calibrate activation "
                "scales)"
            )
        paths = _list_images(args.calib_images, limit=16)
        if not paths:
            sys.exit(f"no images in {args.calib_images!r}")
        imgs = [i for i in (cv2.imread(p) for p in paths) if i is not None]
        if not imgs:
            sys.exit(f"no readable images in {args.calib_images!r}")
        n = pred.quantize_int8(
            imgs,
            search_clip=args.quantize_search,
        )
        print(f"[int8] quantized {n} conv sites", file=sys.stderr)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p)
    out = export_detector(
        pred,
        args.out,
        batch_size=args.batch_size,
        platforms=platforms,
        model_name=args.model,
    )
    sizes = {
        n: os.path.getsize(os.path.join(out, n)) for n in os.listdir(out)
    }
    print(json.dumps({"out": out, "platforms": platforms, "bytes": sizes}))


def cmd_export_pth(args):
    """Export TPU-trained weights to a reference-compatible torch .pth
    (utils/torch_convert.py reverse path): loads like any checkpoint
    saved by the reference's own train scripts
    (utils_fit_change.py:60-63), so models round-trip back into
    `nets/*.py` for cross-checking or GPU serving."""
    from jabd_tpu.utils.torch_convert import (
        export_state_dict_auto,
        save_pth,
    )

    mcfg = _get_config(args.model)
    variables = _load_variables(args, mcfg, args.input_size)
    sd = export_state_dict_auto(variables, mcfg)
    save_pth(sd, args.out)
    print(json.dumps({"out": args.out, "keys": len(sd)}))


IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _list_images(directory, limit=None):
    """Sorted image paths under `directory` (one extension set for
    export/dir-predict/map-txt/calibration — three hand-rolled copies
    of this scan had already drifted on .jpeg)."""
    paths = [
        os.path.join(directory, n)
        for n in sorted(os.listdir(directory))
        if n.lower().endswith(IMAGE_EXTS)
    ]
    return paths[:limit] if limit else paths


def _maybe_quantize(pred, samples, args):
    """Apply --quantize int8 to a live predictor, calibrating on
    `samples` ([N, H, W, 3] images). No-op unless requested."""
    if getattr(args, "quantize", "none") != "int8":
        return
    n = pred.quantize_int8(
        samples, search_clip=getattr(args, "quantize_search", False)
    )
    print(f"[int8] quantized {n} conv sites", file=sys.stderr)


def cmd_serve(args):
    """Serving daemon: dynamic batching over the fused graph behind a
    stdlib HTTP endpoint (jabd_tpu/serve.py). POST /detect with image
    bytes; GET /healthz for batching stats. Backends: a live Predictor
    (--model/--weights, optionally --data-parallel) or an AOT artifact
    (--exported)."""
    from jabd_tpu.serve import BatchingDetector, serve

    if getattr(args, "quantize", "none") == "int8" :
        # No calibration inputs exist at daemon startup; silently
        # serving the float graph under an int8 flag is worse than
        # refusing. The int8 serving path is an exported artifact.
        sys.exit(
            "--quantize int8 is not wired for `serve`: export an int8 "
            "artifact first (cli export --quantize int8 --calib-images "
            "dir/) and start `serve --exported <dir>`"
        )
    if args.exported:
        from jabd_tpu.aot import load_exported

        mesh = None
        if args.data_parallel:
            from jabd_tpu.parallel.mesh import make_mesh_for_batch

            mesh = make_mesh_for_batch(args.batch_size)
        backend = load_exported(args.exported, mesh=mesh)
    else:
        backend = _load_predictor(args)
    det = BatchingDetector(
        backend,
        batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms,
    )
    identity = None
    if args.arch:
        import argparse as _ap

        from jabd_tpu.pipeline import FacePipeline, Gallery
        from jabd_tpu.recognition.cli import _load_backbone
        from jabd_tpu.serve import IdentityService

        model, variables = _load_backbone(
            _ap.Namespace(
                arch=args.arch, ckpt=args.ckpt, fold=bool(args.ckpt),
                quantize="none", quantize_search=False,
            )
        )
        gallery = Gallery.load(args.gallery) if args.gallery else None
        identity = IdentityService(
            FacePipeline(None, model, variables),
            gallery=gallery,
            threshold=args.threshold,
        )
        print(
            f"[identify] {args.arch} embedder"
            + (f", gallery of {len(gallery.names)}" if gallery else ""),
            file=sys.stderr,
        )
    serve(det, host=args.host, port=args.port, identity=identity)


def cmd_predict(args):
    import cv2

    if getattr(args, "exported", ""):
        from jabd_tpu.aot import load_exported

        pred = load_exported(args.exported)
        img = _imread(args.image)
        dets = pred.detect_image(img)
        print(f"{len(dets)} faces (AOT artifact)")
        out = args.out or "out_" + os.path.basename(args.image)
        cv2.imwrite(out, _draw(img, dets))
        print("wrote", out)
        return

    pred = _load_predictor(args)
    img = _imread(args.image)
    if getattr(args, "quantize", "none") == "int8":
        n = pred.quantize_int8(
            img[None],
            search_clip=getattr(args, "quantize_search", False),
        )
        print(f"[int8] quantized {n} conv sites", file=sys.stderr)
    dets = pred.detect_image(img)
    print(f"{len(dets)} faces")
    out = args.out or "out_" + os.path.basename(args.image)
    cv2.imwrite(out, _draw(img, dets))
    print("wrote", out)


def cmd_dir_predict(args):
    """predict.py:527-544 dir_predict mode.

    --batch-size > 1 uses Predictor.detect_images: mixed-resolution
    images are letterboxed ON-DEVICE (per-sample resample matrices) and
    detected through one compiled graph per batch — no per-size
    recompiles like per-image static letterboxing would cost.
    """
    import cv2

    pred = _load_predictor(args)
    os.makedirs(args.out, exist_ok=True)
    names = [os.path.basename(p) for p in _list_images(args.input_dir)]

    bs = max(args.batch_size, 1)

    def decode_chunk(lo):
        # Decode per chunk (not the whole directory) — peak host memory
        # stays at ~2*bs images (current + prefetched).
        chunk_names, chunk = [], []
        for name in names[lo : lo + bs]:
            img = cv2.imread(os.path.join(args.input_dir, name))
            if img is None:
                print(f"[skip] unreadable image {name}")
                continue
            chunk_names.append(name)
            chunk.append(img)
        return chunk_names, chunk

    # Decode-ahead: overlap the NEXT chunk's cv2 decode with the current
    # chunk's device inference (the serving twin of the train loader's
    # prefetch; the reference dir_predict decodes serially,
    # predict.py:527-544).
    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(max_workers=1)
    pending = pool.submit(decode_chunk, 0) if names else None
    for i in range(0, len(names), bs):
        chunk_names, chunk = pending.result()
        pending = (
            pool.submit(decode_chunk, i + bs)
            if i + bs < len(names)
            else None
        )
        if not chunk:
            continue
        if getattr(args, "quantize", "none") == "int8":
            n = pred.quantize_int8(  # calibrate on the 1st chunk
                chunk,
                search_clip=getattr(args, "quantize_search", False),
            )
            print(f"[int8] quantized {n} conv sites", file=sys.stderr)
            args.quantize = "none"
        if bs == 1:
            dets_list = [pred.detect_image(chunk[0])]
        else:
            # Pad the tail chunk to the full batch size (repeat the last
            # image, discard its dets): a smaller final batch would
            # force a fresh XLA compile — minutes through the tunnel.
            n = len(chunk)
            dets_list = pred.detect_images(
                chunk + [chunk[-1]] * (bs - n)
            )[:n]
        for name, img, dets in zip(chunk_names, chunk, dets_list):
            cv2.imwrite(os.path.join(args.out, name), _draw(img, dets))
            print(name, len(dets))
    pool.shutdown(wait=False)


def cmd_identify(args):
    if getattr(args, "quantize", "none") == "int8":
        sys.exit(
            "--quantize int8 is not wired for `identify` (the detection "
            "predictor stays bf16 here); use --embed-quantize for the "
            "embedder or run detection via predict/dir-predict"
        )
    """Detect -> align -> embed -> match against a named gallery (the
    two reference halves joined; jabd_tpu/pipeline.py)."""
    import argparse as _ap

    import cv2

    from jabd_tpu.pipeline import FacePipeline, Gallery, enroll_directory
    from jabd_tpu.recognition.cli import _load_backbone

    pred = _load_predictor(args)
    emb_args = _ap.Namespace(
        arch=args.arch,
        ckpt=args.ckpt,
        fold=bool(args.ckpt),  # folded eval graph when real weights exist
        quantize=args.embed_quantize,
        quantize_search=False,
    )
    model, variables = _load_backbone(emb_args)
    pipe = FacePipeline(pred, model, variables)

    if args.gallery and os.path.exists(args.gallery):
        gallery = Gallery.load(args.gallery)
        print(f"[gallery] loaded {len(gallery.names)} identities",
              file=sys.stderr)
    elif args.gallery_dir:
        gallery = enroll_directory(pipe, args.gallery_dir)
        print(f"[gallery] enrolled {len(gallery.names)} identities",
              file=sys.stderr)
        if args.gallery:
            gallery.save(args.gallery)
            print(f"[gallery] saved -> {args.gallery}", file=sys.stderr)
    else:
        sys.exit("error: need --gallery-dir or an existing --gallery")

    img = _imread(args.image)
    dets, embs = pipe.analyze(img)
    matches = gallery.match(embs, threshold=args.threshold)
    for d, (name, sim) in zip(dets, matches):
        print(
            json.dumps(
                {
                    "box": [round(float(v), 1) for v in d[:4]],
                    "score": round(float(d[4]), 4),
                    "name": name,
                    "cosine": round(sim, 4),
                }
            )
        )
    if args.out:
        drawn = _draw(img, dets)
        for d, (name, sim) in zip(dets, matches):
            cv2.putText(
                drawn,
                f"{name or '?'} {sim:.2f}",
                (int(d[0]), min(int(d[3]) + 14, img.shape[0] - 2)),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.45,
                (0, 255, 255),
                1,
            )
        cv2.imwrite(args.out, drawn)
        print("wrote", args.out)


def cmd_video(args):
    """predict.py:478-520 video mode (EMA fps overlay)."""
    import cv2

    pred = _load_predictor(args)
    src = int(args.video) if args.video.isdigit() else args.video
    cap = cv2.VideoCapture(src)
    writer = None
    fps = 0.0
    n_frames = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if n_frames == 0:
            _maybe_quantize(pred, frame[None], args)
        t0 = time.time()
        dets = pred.detect_image(frame)
        fps = 0.9 * fps + 0.1 / max(time.time() - t0, 1e-6)
        frame = _draw(frame, dets)
        cv2.putText(frame, f"fps {fps:.1f}", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 0), 2)
        if args.out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out,
                    cv2.VideoWriter_fourcc(*"mp4v"),
                    25,
                    (frame.shape[1], frame.shape[0]),
                )
            writer.write(frame)
        else:
            # Headless environment: no --out means no sink (the
            # reference shows a cv2 window, predict.py:478-520) — print
            # a throttled per-frame line so the run is observable.
            if n_frames % 25 == 0:
                print(
                    f"frame {n_frames}: {len(dets)} faces, fps {fps:.1f}",
                    flush=True,
                )
        n_frames += 1
    cap.release()
    if writer:
        writer.release()
    print(f"processed {n_frames} frames")


def cmd_fps(args):
    import cv2

    pred = _load_predictor(args)
    img = _imread(args.image)
    _maybe_quantize(pred, img[None], args)
    fps = pred.get_fps(img, test_interval=args.iters, method=args.method)
    print(
        json.dumps(
            {"fps": fps, "method": args.method, "input": args.input_size}
        )
    )


def cmd_count(args):
    """count_param.py equivalent: params + XLA-measured FLOPs."""
    import jax
    import jax.numpy as jnp

    from jabd_tpu import configs
    from jabd_tpu.models import build_model
    from jabd_tpu.utils.profiling import count_params, flops_of

    mcfg = _get_config(args.model)
    model = build_model(mcfg, mode="eval")
    x = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), x
    )
    n = count_params(variables["params"])
    fl = flops_of(lambda v, i: model.apply(v, i, train=False), variables, x)
    out = {
        "model": args.model,
        "params_m": round(n / 1e6, 4),
        "gflops": round(fl / 1e9, 4),
        "input": args.size,
    }
    if getattr(args, "per_layer", False):
        from jabd_tpu.utils.profiling import (
            per_layer_table,
            per_layer_table_subprocess,
        )

        if jax.default_backend() == "cpu":
            rows = per_layer_table(model, x, total_params=n, total_flops=fl)
        else:
            # per-module FLOPs come from the uncompiled lowering, which
            # only the CPU backend populates — compute the table in a
            # CPU-forced child (logical FLOPs are backend-independent)
            rows = per_layer_table_subprocess(
                args.model, args.size, total_params=n, total_flops=fl
            )
        out["per_layer"] = rows
        # human-readable table alongside the JSON (the reference prints
        # fvcore's flop_count_table, count_param.py:388-395)
        w = max(len(r["module"]) for r in rows) + 2
        print(f"{'module'.ljust(w)}{'params':>12}  {'gflops':>10}")
        for r in rows:
            print(
                f"{r['module'].ljust(w)}{r['params']:>12,}  "
                f"{r['gflops']:>10.4f}"
            )
    print(json.dumps(out))


def _quantize_for_map_txt(args, pred):
    """int8-quantize the predictor before a map-txt sweep, calibrating on
    the val tree's first images. With --quantize-search + --gt-dir the
    clip-ratio grid is scored by the TASK metric — mean Easy/Medium/Hard
    WIDER AP of a full quantized sweep per candidate — instead of the
    output-error proxy (VERDICT r3: 'wire --quantize-search scoring to
    AP where a GT tree is available')."""
    import cv2

    sample = []
    for event in sorted(os.listdir(args.val_dir)):
        event_dir = os.path.join(args.val_dir, event)
        if not os.path.isdir(event_dir):
            continue
        for name in sorted(os.listdir(event_dir)):
            if name.lower().endswith((".jpg", ".png")) and len(sample) < 8:
                img = cv2.imread(os.path.join(event_dir, name))
                if img is not None:
                    sample.append(img)
    if not sample:
        raise SystemExit("--quantize int8: no readable val images")

    score_fn = None
    if getattr(args, "quantize_search", False) and getattr(
        args, "gt_dir", ""
    ):
        from jabd_tpu.eval import evaluate_wider
        from jabd_tpu.eval.run_wider import run_wider_val

        def score_fn(qvars):
            saved = pred.variables
            pred.variables = pred._place_variables(qvars)
            try:
                preds = run_wider_val(
                    pred, args.val_dir, batch_size=max(args.batch_size, 1)
                )
                aps = evaluate_wider(preds, args.gt_dir)
                score = -(aps["easy"] + aps["medium"] + aps["hard"]) / 3.0
                print(f"[int8 search] mean AP {-score:.4f}", file=sys.stderr)
                return score
            finally:
                pred.variables = saved

    n = pred.quantize_int8(
        sample,
        search_clip=getattr(args, "quantize_search", False),
        score_fn=score_fn,
    )
    print(f"[int8] quantized {n} conv sites", file=sys.stderr)


def cmd_map_txt(args):
    """get_map_txt dump over a WIDER val tree (predict.py:338-415 format
    consumed by the evaluator).

    --batch-size > 1 streams the whole tree through the fused batched
    device program (eval/run_wider.py, BASELINE config #2); --multiscale
    runs the bicubic image-pyramid sweep (BASELINE config #5), with
    --pyramid host (default: byte-exact two-stage cv2 recipe, dumps
    diff clean vs the per-image path) or --pyramid device (opt-in
    on-device composed-plan pre-scale — approximate: <=0.05 grey
    levels vs host, plus a 2048px source pre-shrink the host mode
    doesn't apply). Single-scale batched dumps are byte-identical to
    the single-image path.
    """
    import cv2

    pred = _load_predictor(args)
    if getattr(args, "quantize", "none") == "int8":
        _quantize_for_map_txt(args, pred)
    if args.batch_size > 1 or args.multiscale:
        from jabd_tpu.eval.run_wider import run_wider_val

        run_wider_val(
            pred,
            args.val_dir,
            batch_size=args.batch_size,
            out_dir=args.out,
            multiscale=args.multiscale,
            pyramid=args.pyramid,
        )
        return
    for event in sorted(os.listdir(args.val_dir)):
        event_dir = os.path.join(args.val_dir, event)
        if not os.path.isdir(event_dir):
            continue
        out_event = os.path.join(args.out, event)
        os.makedirs(out_event, exist_ok=True)
        for name in sorted(os.listdir(event_dir)):
            if not name.lower().endswith((".jpg", ".png")):
                continue
            img = cv2.imread(os.path.join(event_dir, name))
            if img is None:
                print("skipping unreadable", name, file=sys.stderr)
                continue
            rows = pred.get_map_txt_rows(img)
            stem = os.path.splitext(name)[0]
            with open(os.path.join(out_event, stem + ".txt"), "w") as f:
                f.write(f"{event}/{name}\n{len(rows)}\n")
                for r in rows:
                    f.write(
                        f"{r[0]:.3f} {r[1]:.3f} {r[2]:.3f} {r[3]:.3f} "
                        f"{r[4]:.5f}\n"
                    )
        print("event done:", event)


def cmd_eval(args):
    from jabd_tpu.eval import evaluate_wider

    aps = evaluate_wider(args.pred_dir, args.gt_dir, iou_thresh=args.iou)
    print(json.dumps({k: round(v, 5) for k, v in aps.items()}))


def cmd_train(args):
    from jabd_tpu import configs, train
    from jabd_tpu.data import WiderFaceDataset
    from jabd_tpu.utils.checkpoint import CheckpointManager

    mcfg = _get_config(args.model)
    tcfg = configs.TrainConfig(
        batch_size=args.batch_size,
        image_size=args.input_size,
        total_epochs=args.epochs,
        freeze_epochs=args.freeze_epochs,
        device_augment=args.device_augment,
        save_period=args.save_period,
        microbatches=args.microbatches,
        matching_impl=args.matching_impl,
        fsdp=args.fsdp,
    )
    ds = WiderFaceDataset(args.label_txt, input_size=tcfg.image_size)
    mgr = CheckpointManager(args.ckpt_dir)
    train.fit(mcfg, tcfg, ds, log_dir=args.log_dir, checkpoint_manager=mgr)


def main(argv=None):
    from jabd_tpu.utils import compile_cache

    compile_cache.enable()
    p = argparse.ArgumentParser(prog="jabd_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, weights=True):
        sp.add_argument("--model", default="jabd_flagship")
        if weights:
            sp.add_argument("--weights", default="")
        sp.add_argument("--confidence", type=float, default=0.5)
        # 0.3 = the reference's EFFECTIVE threshold: its declared
        # "nms_iou": 0.45 is dead (call sites pass only confidence,
        # predict.py:181; default 0.3 at utils_bbox.py:260).
        sp.add_argument("--nms-iou", type=float, default=0.3)
        sp.add_argument("--input-size", type=int, default=1280)
        sp.add_argument(
            "--quantize", choices=["none", "int8"], default="none",
            help="int8: per-channel int8 convs (MXU 2x bf16 on v5e), "
            "activation scales self-calibrated on the first input",
        )
        sp.add_argument(
            "--quantize-search", action="store_true",
            help="with --quantize int8: grid-search a global activation "
            "clip ratio by end-to-end output error on the calibration "
            "images (clips outliers, tightens the int8 grid)",
        )
        sp.add_argument(
            "--spatial", action="store_true",
            help="spatially partition the forward over all local devices "
            "(image height sharded, GSPMD conv halos): the multi-chip "
            "LATENCY mode — batch=1 scales across chips, unlike "
            "--data-parallel which needs mesh-divisible batches",
        )

    sp = sub.add_parser("predict")
    common(sp)
    sp.add_argument("--image", required=True)
    sp.add_argument("--out", default="")
    sp.add_argument(
        "--exported",
        default="",
        help="serve from an AOT artifact dir (cli export) instead of "
        "building the model — no --model/--weights needed",
    )
    sp.set_defaults(fn=cmd_predict)

    sp = sub.add_parser(
        "export",
        help="serialize the fused detect graph to an AOT serving "
        "artifact (StableHLO + params + manifest)",
    )
    common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--batch-size", type=int, default=1)
    sp.add_argument(
        "--platforms",
        default="tpu",
        help="comma list; 'tpu' alone uses the Pallas NMS kernel, "
        "multi-platform artifacts fall back to the XLA NMS",
    )
    sp.add_argument(
        "--calib-images",
        default="",
        help="with --quantize int8: directory of representative images "
        "for activation-scale calibration (the artifact captures the "
        "int8 graph)",
    )
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser(
        "serve",
        help="HTTP serving daemon with dynamic batching (POST /detect, "
        "GET /healthz)",
    )
    common(sp)
    sp.add_argument("--exported", default="", help="serve an AOT artifact")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8712)
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument(
        "--max-wait-ms",
        type=float,
        default=15.0,
        help="max time to wait for batch-mates after the first request",
    )
    sp.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard serving batches over all local devices",
    )
    sp.add_argument(
        "--arch", default="",
        help="IR embedder arch (e.g. ir_50): enables POST /identify "
        "(detect -> align -> embed -> name)",
    )
    sp.add_argument("--ckpt", default="", help="embedder weights")
    sp.add_argument(
        "--gallery", default="",
        help="gallery npz from `cli identify --gallery` for naming",
    )
    sp.add_argument("--threshold", type=float, default=0.3)
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser(
        "export-pth",
        help="export weights (orbax checkpoint or random init) to a "
        "reference-compatible torch .pth state dict",
    )
    common(sp)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_export_pth)

    sp = sub.add_parser("dir-predict")
    common(sp)
    sp.add_argument("--input-dir", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--batch-size",
        type=int,
        default=1,
        help=">1 batches mixed-size images through one compiled graph "
        "(on-device letterbox)",
    )
    sp.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard serving batches over all local devices (DataParallel "
        "analog; batch size must divide the device count)",
    )
    sp.set_defaults(fn=cmd_dir_predict)

    sp = sub.add_parser(
        "identify",
        help="detect faces, align on the 5-point landmarks, embed with "
        "an IR backbone, and name them against a gallery "
        "(--gallery-dir tree of <name>/*.jpg, or a saved --gallery npz)",
    )
    common(sp)
    sp.add_argument("--image", required=True)
    sp.add_argument("--gallery-dir", default="")
    sp.add_argument(
        "--gallery", default="",
        help="npz path: loaded if it exists, else written after "
        "enrolling --gallery-dir",
    )
    sp.add_argument("--arch", default="ir_50")
    sp.add_argument("--ckpt", default="", help="embedder weights "
                    "(.pth/.ckpt via the IR converter, or orbax dir)")
    sp.add_argument("--threshold", type=float, default=0.3)
    sp.add_argument(
        "--embed-quantize", choices=["none", "int8"], default="none"
    )
    sp.add_argument("--out", default="")
    sp.set_defaults(fn=cmd_identify)

    sp = sub.add_parser("video")
    common(sp)
    sp.add_argument("--video", default="0")
    sp.add_argument("--out", default="")
    sp.set_defaults(fn=cmd_video)

    sp = sub.add_parser("fps")
    common(sp)
    sp.add_argument("--image", required=True)
    sp.add_argument("--iters", type=int, default=100)
    sp.add_argument(
        "--method",
        choices=["chained", "wall"],
        default="chained",
        help="'chained' is honest under async/remote dispatch (default); "
        "'wall' is the reference's dispatch-loop harness "
        "(predict.py:253-333) for directly-attached hardware",
    )
    sp.set_defaults(fn=cmd_fps)

    sp = sub.add_parser("count")
    sp.add_argument("--model", default="jabd_flagship")
    sp.add_argument("--size", type=int, default=640)
    sp.add_argument(
        "--per-layer",
        action="store_true",
        help="additionally print a per-module params/GFLOPs table "
        "(count_param.py:388-395's flop_count_table role)",
    )
    sp.set_defaults(fn=cmd_count)

    sp = sub.add_parser("map-txt")
    common(sp)
    sp.add_argument("--val-dir", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--batch-size",
        type=int,
        default=1,
        help=">1 runs the fused batched val sweep (BASELINE config #2)",
    )
    sp.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard the val sweep's batches over all local devices",
    )
    sp.add_argument(
        "--multiscale",
        action="store_true",
        help="bicubic image-pyramid eval (BASELINE config #5)",
    )
    sp.add_argument(
        "--pyramid",
        choices=("device", "host"),
        default="host",
        help="multiscale pre-scale: byte-exact host cv2 recipe "
        "(default) or opt-in on-device composed plans (approximate, "
        "<=0.05 grey levels + a 2048px source cap)",
    )
    sp.add_argument(
        "--gt-dir",
        default="",
        help="with --quantize int8 --quantize-search: score clip-ratio "
        "candidates by WIDER AP against this GT tree (one full val "
        "sweep per grid point — use a small val subset) instead of "
        "end-to-end output error",
    )
    sp.set_defaults(fn=cmd_map_txt)

    sp = sub.add_parser("eval")
    sp.add_argument("--pred-dir", required=True)
    sp.add_argument("--gt-dir", required=True)
    sp.add_argument("--iou", type=float, default=0.4)
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("train")
    sp.add_argument("--model", default="jabd_flagship")
    sp.add_argument("--label-txt", required=True)
    sp.add_argument("--batch-size", type=int, default=34)
    sp.add_argument("--input-size", type=int, default=840)
    sp.add_argument("--epochs", type=int, default=100)
    sp.add_argument("--freeze-epochs", type=int, default=50)
    sp.add_argument("--save-period", type=int, default=5)
    sp.add_argument("--ckpt-dir", default="checkpoints")
    sp.add_argument("--log-dir", default="logs")
    sp.add_argument(
        "--microbatches",
        type=int,
        default=1,
        help="split each batch into N ghost-BN microbatches inside one "
        "jitted step (lax.scan): chunk-sized activations/HLO, one "
        "optimizer update — lets effective batch grow past single-shot "
        "compile/HBM limits (see TrainConfig.microbatches)",
    )
    sp.add_argument(
        "--device-augment",
        action="store_true",
        help="run get_random_data augmentation on the TPU (MXU resample "
        "+ fused HSV; host only decodes+pads — see data/device_augment)",
    )
    sp.add_argument(
        "--matching-impl",
        choices=["auto", "xla", "pallas", "pallas_interpret"],
        default="auto",
        help="anchor-matching kernel: 'auto' = Pallas on TPU, XLA "
        "elsewhere (on a >1-device mesh the Pallas kernel runs "
        "per-shard via shard_map — see losses.multibox_loss)",
    )
    sp.add_argument(
        "--fsdp",
        action="store_true",
        help="ZeRO-style memory scaling on >1-device meshes: shard "
        "large params + Adam moments over the data mesh instead of "
        "replicating (parallel/fsdp.py; numerically identical to DP)",
    )
    sp.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
