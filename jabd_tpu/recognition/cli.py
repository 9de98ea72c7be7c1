"""Recognition command-line entry points.

Covers the reference's recognition CLIs:
  * main.py (Lightning trainer entry — broken upstream: empty config.py)
      -> `python -m jabd_tpu.recognition.cli train ...`
  * validation_lq/validate_tinyface.py
      -> `python -m jabd_tpu.recognition.cli tinyface ...`
  * validation_lq/validate_IJB_S.py (protocol runner over extracted
    features; template construction is dataset-driven)
      -> `python -m jabd_tpu.recognition.cli extract ...` then the
         IJBSTest API (jabd_tpu.recognition.ijbs).
  * 5-set verification (train_val.py:106-136)
      -> `python -m jabd_tpu.recognition.cli verify ...`
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_backbone(args):
    import jax
    import jax.numpy as jnp

    from jabd_tpu.recognition import build_model

    model = build_model(args.arch)
    if args.ckpt:
        if args.ckpt.endswith((".pth", ".tar", ".ckpt")):
            from jabd_tpu.recognition.torch_convert import (
                convert_ir_state_dict,
            )
            from jabd_tpu.utils.torch_convert import load_pth

            layers = model.num_layers
            params, stats = convert_ir_state_dict(
                load_pth(args.ckpt), num_layers=layers, mode=model.mode
            )
            variables = {"params": params, "batch_stats": stats}
        else:
            import orbax.checkpoint as ocp

            import os

            variables = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.ckpt)
            )
    else:
        print("[warn] no --ckpt: random init", file=sys.stderr)
        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3), jnp.float32)
        )
    if getattr(args, "fold", False) or (
        getattr(args, "quantize", "none") != "none"
    ):
        from jabd_tpu.recognition.fold import fold_ir

        variables = fold_ir(variables)
    if getattr(args, "quantize", "none") == "int8":
        import numpy as np

        from jabd_tpu.models.quantize import calibrate, quantize_variables

        # Self-calibrate on normalized random faces (serving inputs are
        # (x/255 - 0.5) / 0.5, so the absmax envelope is data-light).
        sample = jnp.asarray(
            (
                np.random.default_rng(0).integers(
                    0, 256, (8, 112, 112, 3)
                ).astype(np.float32)
                / 255.0
                - 0.5
            )
            / 0.5
        )
        calib = calibrate(model, variables, [sample])
        ratio = 1.0
        if getattr(args, "quantize_search", False):
            from jabd_tpu.models.quantize import search_clip_ratio

            ratio, _ = search_clip_ratio(model, variables, calib, [sample])
            print(f"[int8] clip ratio {ratio}", file=sys.stderr)
        variables, n = quantize_variables(variables, calib, clip_ratio=ratio)
        print(f"[int8] quantized {n} conv sites", file=sys.stderr)
    return model, variables


def _load_images(paths, batch_hint=256):
    import cv2
    import numpy as np

    from jabd_tpu.recognition.data import normalize_face

    out = np.zeros((len(paths), 112, 112, 3), np.float32)
    for i, p in enumerate(paths):
        img = cv2.imread(p)
        if img is None:
            raise SystemExit(f"error: cannot read image {p!r}")
        if img.shape[:2] != (112, 112):
            img = cv2.resize(img, (112, 112))
        out[i] = normalize_face(img[:, :, ::-1])  # BGR -> RGB
    return out


def cmd_export(args):
    """Serialize the embedding graph to an AOT serving artifact
    (jabd_tpu/aot.py::export_embedder): StableHLO + params + manifest,
    served without model code via aot.load_exported(...).embed.
    Composes with --fold / --quantize int8 (the artifact captures the
    folded or int8 graph)."""
    import os

    from jabd_tpu.aot import export_embedder

    model, variables = _load_backbone(args)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p)
    out = export_embedder(
        model,
        variables,
        args.out,
        batch_size=args.batch_size,
        image_size=112,
        platforms=platforms,
        model_name=args.arch,
    )
    sizes = {
        n: os.path.getsize(os.path.join(out, n)) for n in os.listdir(out)
    }
    print(json.dumps({"out": out, "platforms": platforms, "bytes": sizes}))


def cmd_train(args):
    import jax

    from jabd_tpu.recognition import build_head, build_model
    from jabd_tpu.recognition import train as RT
    from jabd_tpu.recognition.data import ImageFolderDataset

    import jax.numpy as jnp

    # Flag validation BEFORE the (expensive) model/state build.
    if getattr(args, "fsdp", False) and not getattr(
        args, "shard_head", False
    ):
        raise SystemExit(
            "--fsdp requires --shard-head (the FSDP placement rides the "
            "same sharded-step jit; plain DP stays replicated)"
        )
    ds = ImageFolderDataset(args.data_root)
    model = build_model(
        args.arch,
        dtype=jnp.bfloat16 if getattr(args, "precision", 32) == 16
        else jnp.float32,
    )
    pad_to = 0
    if getattr(args, "shard_head", False):
        # Pad the classifier width to the mesh size make_mesh_for_batch
        # will pick (device count, shrunk until it divides the batch).
        import jax as _jax

        pad_to = len(_jax.devices())
        while pad_to > 1 and args.batch_size % pad_to != 0:
            pad_to -= 1
    head = build_head(
        args.head, class_num=ds.num_classes, m=args.m, pad_to=pad_to
    )
    steps_per_epoch = max(len(ds) // args.batch_size, 1)
    state = RT.create_state(
        jax.random.PRNGKey(args.seed), model, head,
        num_train_steps_hint=steps_per_epoch * args.epochs, lr=args.lr,
        milestones=tuple(
            m * steps_per_epoch for m in args.milestones
        ),
    )
    if getattr(args, "shard_head", False) and getattr(
        args, "microbatches", 1
    ) > 1:
        raise SystemExit(
            "--microbatches with --shard-head is not supported: the "
            "class-sharded step is already the memory lever for the head, "
            "and chunk-scanning under the sharded program is untested"
        )
    if getattr(args, "shard_head", False):
        # PartialFC-style class-sharded head over all local chips
        # (recognition/parallel.py): batch rides the data axis, the
        # classifier kernel + its momentum shard along classes.
        from jabd_tpu.parallel.mesh import make_mesh_for_batch
        from jabd_tpu.recognition import parallel as RP

        mesh = make_mesh_for_batch(args.batch_size)
        maker = (
            RP.make_sharded_train_step_aug
            if args.device_augment
            else RP.make_sharded_train_step
        )
        step, state = maker(
            model, head, state, mesh,
            fsdp=getattr(args, "fsdp", False),
        )
        print(
            f"[shard-head] {ds.num_classes} classes over "
            f"{mesh.devices.size} devices"
            + (" + fsdp backbone" if getattr(args, "fsdp", False) else ""),
            file=sys.stderr,
        )
    elif args.device_augment:
        step = RT.make_train_step_aug(
            model, head, microbatches=getattr(args, "microbatches", 1)
        )
    else:
        step = RT.make_train_step(
            model, head, microbatches=getattr(args, "microbatches", 1)
        )

    RT.fit(
        model,
        head,
        state,
        step,
        ds,
        args.batch_size,
        args.epochs,
        device_augment=args.device_augment,
        seed=args.seed,
        val_dir=args.val_dir,
        checkpoint_dir=args.checkpoint_dir,
        save_period=args.save_period,
        resume=not args.no_resume,
    )


def cmd_verify(args):
    from jabd_tpu.recognition import train as RT

    model, variables = _load_backbone(args)
    out = RT.validate_5sets(model, variables, args.data_dir)
    print(json.dumps(out))


def cmd_tinyface(args):
    """validate_tinyface.py equivalent: extract flip-TTA features over
    the protocol's image list and report rank-k accuracy."""
    from jabd_tpu.recognition import train as RT
    from jabd_tpu.recognition.tinyface import TinyFaceTest

    model, variables = _load_backbone(args)
    test = TinyFaceTest(args.tinyface_root, args.alignment_dir)
    images = _load_images(test.image_paths)
    faceness = None
    if args.faceness_scores:
        import numpy as np

        faceness = np.load(args.faceness_scores)
        assert len(faceness) == len(test.image_paths), (
            "faceness scores must align with the protocol image list"
        )
    feats, _ = RT.extract_embeddings_tta(
        model,
        variables,
        images,
        batch_size=args.batch_size,
        fusion_method=args.fusion_method,
        use_flip_test=not args.no_flip_test,
        faceness_scores=faceness,
    )
    res = test.test_identification(feats, ranks=(1, 5, 20))
    print(json.dumps({f"rank_{k}": v for k, v in res.items()}))


def cmd_extract(args):
    """Feature extraction for IJB-S-scale protocols: writes partitioned
    .npz features aligned with the input list file
    (validate_IJB_S.py:59-106)."""
    import numpy as np

    from jabd_tpu.recognition import train as RT

    with open(args.image_list) as f:
        paths = [line.strip() for line in f if line.strip()]
    model, variables = _load_backbone(args)
    mesh = None
    if getattr(args, "data_parallel", False):
        from jabd_tpu.parallel.mesh import make_mesh_for_batch

        mesh = make_mesh_for_batch(args.batch_size)
        if mesh.size > 1:
            print(
                f"[mesh] extraction sharded over {mesh.size} devices",
                file=sys.stderr,
            )
    emb, norms = RT.extract_features_partitioned(
        model,
        variables,
        image_loader=lambda i: _load_images([paths[i]])[0],
        num_images=len(paths),
        num_partitions=args.partitions,
        batch_size=args.batch_size,
        save_dir=args.out_dir,
        mesh=mesh,
    )
    np.savez(
        f"{args.out_dir}/features.npz", emb=emb, norm=norms,
        paths=np.asarray(paths),
    )
    print(f"extracted {len(paths)} features -> {args.out_dir}/features.npz")


def cmd_ijbs(args):
    """validate_IJB_S.py equivalent: features.npz (from `extract`) +
    the cs6 protocol directory -> all five IJB-S protocol metrics."""
    import numpy as np

    from jabd_tpu.recognition.ijbs_proto import IJBSProtocol

    data = np.load(args.features, allow_pickle=True)
    emb, norm = data["emb"], data["norm"]
    paths = [str(p) for p in data["paths"]]
    proto = IJBSProtocol.from_protocol_dir(args.protocol_dir)
    proto.initialize_indices(paths)
    test = proto.build_test(
        emb, norm, fuse_match_method=args.fuse_match_method
    )
    out = {}
    for name, (closed, open_) in test.run_all().items():
        out[name] = {
            "rank1": float(closed[0]),
            "rank5": float(closed[1]),
            "rank10": float(closed[2]),
            "dir_far_0.01": float(open_[0]),
            "dir_far_0.1": float(open_[1]),
        }
    print(json.dumps(out, indent=2))


def main(argv=None):
    from jabd_tpu.utils import compile_cache

    compile_cache.enable()
    p = argparse.ArgumentParser(prog="jabd_tpu.recognition")
    sub = p.add_subparsers(dest="cmd", required=True)

    def model_args(sp):
        sp.add_argument("--arch", default="ir_50")
        sp.add_argument("--ckpt", default="")
        sp.add_argument("--batch-size", type=int, default=256)
        sp.add_argument(
            "--fold", action="store_true",
            help="fold conv+BN pairs for the eval graph (exact)",
        )
        sp.add_argument(
            "--quantize", choices=["none", "int8"], default="none",
            help="int8 MXU convs (2x bf16 peak); activation scales "
            "self-calibrated on synthetic normalized inputs — for "
            "production accuracy calibrate on real samples via the API",
        )
        sp.add_argument(
            "--quantize-search", action="store_true",
            help="with --quantize int8: grid-search a global activation "
            "clip ratio by end-to-end embedding error",
        )

    sp = sub.add_parser("train")
    sp.add_argument("--data-root", required=True)
    sp.add_argument("--arch", default="ir_50")
    sp.add_argument("--head", default="adaface")
    sp.add_argument("--m", type=float, default=0.4)
    sp.add_argument("--lr", type=float, default=0.1)
    sp.add_argument("--batch-size", type=int, default=256)
    sp.add_argument("--epochs", type=int, default=26)
    sp.add_argument("--milestones", type=int, nargs="+",
                    default=[12, 20, 24])
    sp.add_argument("--val-dir", default="")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument(
        "--checkpoint-dir", default="",
        help="Orbax epoch checkpoints (params + batch-stats + optimizer "
        "state) with auto-resume from the latest; a best-on-val_acc copy "
        "lands under <dir>/best and per-epoch metrics in "
        "<dir>/metrics.csv (the Lightning ModelCheckpoint + CSVLogger "
        "surface, main.py:26-33)",
    )
    sp.add_argument("--save-period", type=int, default=1)
    sp.add_argument(
        "--no-resume", action="store_true",
        help="start fresh even if --checkpoint-dir has checkpoints",
    )
    sp.add_argument(
        "--device-augment",
        action="store_true",
        help="run the AdaFace augmentation on the TPU inside the jitted "
        "step (crop mask + composed cv2-resample matmuls + photometric); "
        "the host only decodes",
    )
    sp.add_argument(
        "--shard-head",
        action="store_true",
        help="PartialFC-style model parallelism: shard the classifier "
        "kernel (and its momentum) along the class axis over all local "
        "devices while the batch rides the data axis — the memory/scale "
        "answer for web-scale identity counts (recognition/parallel.py)",
    )
    sp.add_argument(
        "--fsdp",
        action="store_true",
        help="with --shard-head: additionally shard large backbone "
        "params + their SGD momentum over the mesh (FSDP/ZeRO rule, "
        "parallel/fsdp.py) — per-chip memory ~1/N, numerically "
        "identical to replicated",
    )
    sp.add_argument(
        "--microbatches", type=int, default=1,
        help="accumulate_grad_batches analog (main.py:40-50): split each "
        "batch into N chunks inside ONE jitted step (lax.scan), average "
        "the gradients, apply one update — pass batch-size = effective "
        "batch and microbatches = accumulate count",
    )
    sp.add_argument(
        "--precision", type=int, choices=(16, 32), default=32,
        help="Lightning precision switch (main.py:43): 16 runs the "
        "backbone in bfloat16 compute (params and the margin head stay "
        "float32)",
    )
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser(
        "export",
        help="serialize the embedding graph to an AOT serving artifact "
        "(composes with --fold / --quantize int8)",
    )
    model_args(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--platforms", default="tpu", help="comma list, e.g. tpu,cpu"
    )
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("verify")
    model_args(sp)
    sp.add_argument("--data-dir", required=True)
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("tinyface")
    model_args(sp)
    sp.add_argument("--tinyface-root", required=True)
    sp.add_argument(
        "--alignment-dir", default="aligned_pad_0.1_pad_high"
    )
    # validate_tinyface.py:127-128 flags.
    sp.add_argument(
        "--fusion-method",
        default="pre_norm_vector_add",
        choices=(
            "average",
            "norm_weighted_avg",
            "pre_norm_vector_add",
            "concat",
            "faceness_score",
        ),
    )
    sp.add_argument("--no-flip-test", action="store_true")
    sp.add_argument(
        "--faceness-scores",
        default="",
        help=".npy of per-image detector scores aligned with the "
        "protocol image list (required for faceness_score fusion)",
    )
    sp.set_defaults(fn=cmd_tinyface)

    sp = sub.add_parser("extract")
    model_args(sp)
    sp.add_argument("--image-list", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--partitions", type=int, default=100)
    sp.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard extraction batches over all local devices (the "
        "multi-chip answer to the reference's per-GPU DDP feature "
        "sharding, validate_IJB_S.py:59-106)",
    )
    sp.set_defaults(fn=cmd_extract)

    sp = sub.add_parser("ijbs")
    sp.add_argument(
        "--features", required=True,
        help="features.npz from `extract` (emb, norm, paths)",
    )
    sp.add_argument(
        "--protocol-dir", required=True,
        help="IJB-S cs6 protocol directory (cs6_metadata.csv, galleries/)",
    )
    sp.add_argument(
        "--fuse-match-method",
        default="pre_norm_vector_add_cos",
        choices=("pre_norm_vector_add_cos", "mean_cos"),
    )
    sp.set_defaults(fn=cmd_ijbs)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
