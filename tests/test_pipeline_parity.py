"""FULL-PIPELINE parity against the reference at its eval operating point
(BASELINE target #1, VERDICT r3 top ask).

For each assembly the COMPLETE inference pipeline runs twice on the same
images with the same weights:

  reference: letterbox_image 1280^2 (utils/utils.py:8) -> preprocess_input
    (:28) -> the reference's OWN RetinaFace module forward (mode='eval')
    -> decode/decode_landm (utils/utils_bbox.py:29,39) ->
    non_max_suppression (:260; torchvision.ops.nms stubbed with our
    keep-set-parity-tested greedy oracle — torchvision isn't in this
    environment) -> retinaface_correct_boxes (:9) -> pixel scaling -> txt
    dump (predict.py:338-415 get_map_txt) -> utils/utils_map.py:173-223
    evaluation;

  ours: Predictor.detect_image -> txt dump -> eval.wider_eval.

Weights flow OUR random init -> export_state_dict_auto -> the reference
module (strict loading: zero unexpected keys; missing keys must be
reference DEAD params only). Class heads are biased toward background —
adaptively, from a probe forward's logit-margin quantile, since head
feature magnitudes vary 10x across presets — so a few hundred anchors
clear the confidence gate and the NMS/PR sweep is non-vacuous. Ground truth is synthesized from our
top detections plus unmatched distractors, so all three AP settings land
strictly inside (0, 1).

Asserted, per assembly: per-image keep-set equality over real-image
detections modulo a tight f32 decision-boundary budget (every high-band
box pairs up at IoU >= 0.99 with scores within 2e-3; at most 2 boundary
flips per image across the 0.5 confidence gate and the 0.3 NMS-IoU
threshold; total counts within 3; letterbox-pad keeps excluded — exact
score ties there make NMS order undefined, see inline comment), and
Easy/Medium/Hard AP equal within 1e-3 across BOTH pipelines and BOTH
evaluators.
"""

import contextlib
import dataclasses
import importlib.util
import io
import os
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.predict import Predictor
from jabd_tpu.utils.torch_convert import export_state_dict_auto
from tests.test_eval import _fake_gt_dir

REF_ROOT = "/root/reference/JABD2080ti"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF_ROOT), reason="reference tree not mounted"
    ),
]

torch = pytest.importorskip("torch")

INPUT = 1280  # the reference predict.py operating point (predict.py:50)


def _nms_stub(boxes, scores, iou_threshold):
    """torchvision.ops.nms replacement: the greedy oracle whose keep-set
    parity vs torchvision semantics is pinned in tests/test_nms.py."""
    from jabd_tpu.ops.nms import nms_numpy

    keep = nms_numpy(
        np.asarray(boxes.detach().cpu(), np.float32),
        np.asarray(scores.detach().cpu(), np.float32),
        iou_threshold=float(iou_threshold),
    )
    return torch.as_tensor(np.asarray(keep, np.int64))


@pytest.fixture(scope="module")
def ref():
    """Reference modules, imported read-only with torchvision stubbed
    (IntermediateLayerGetter + resnet50 from the reference's own 4-layer
    vendored copy + ops.nms -> greedy oracle)."""
    import types

    from tests.test_reference_backbones import _ensure_torchvision_stub

    _ensure_torchvision_stub()
    sys.path.insert(0, REF_ROOT)
    try:
        import nets.resnet_pytorch_r as ref_rpr

        tv = sys.modules["torchvision"]
        # the vendored modules rebind `resnet50` to an INSTANCE at module
        # bottom (resnet_pytorch_r.py tail) — call the factory directly
        tv.models.resnet50 = lambda pretrained=False, **kw: ref_rpr._resnet(
            "resnet50", ref_rpr.Bottleneck, [3, 4, 6, 3], False, True, **kw
        )
        if "torchvision.ops" not in sys.modules:
            tv_ops = types.ModuleType("torchvision.ops")
            tv_ops.nms = _nms_stub
            tv.ops = tv_ops
            sys.modules["torchvision.ops"] = tv_ops

        import nets.retinaface as rf_vanilla
        import nets.retinaface_eca_nonlocal as rf_eca_nl
        import nets.retinaface_r as rf_r
    finally:
        sys.path.remove(REF_ROOT)

    def _load(name, rel):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_ROOT, rel)
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    return {
        "vanilla": rf_vanilla,
        "eca_nl": rf_eca_nl,
        "r": rf_r,
        "utils": _load("refpp_utils", "utils/utils.py"),
        "bbox": _load("refpp_bbox", "utils/utils_bbox.py"),
        "anchors": _load("refpp_anchors", "utils/anchors.py"),
        "map": _load("refpp_map", "utils/utils_map.py"),
        "config": _load("refpp_config", "utils/config.py"),
    }


def _ref_get_map_txt(ref, net, ref_cfg, anchors_t, image_f32, confidence):
    """predict.py:338-415 get_map_txt, verbatim semantics, on the
    reference's own building blocks. image_f32: [H, W, 3] float32."""
    image = np.array(image_f32, np.float32)
    im_height, im_width, _ = image.shape
    scale = [im_width, im_height, im_width, im_height]
    scale_lm = [im_width, im_height] * 5

    image = ref["utils"].letterbox_image(image, [INPUT, INPUT])
    with torch.no_grad():
        x = (
            torch.from_numpy(
                ref["utils"].preprocess_input(image).transpose(2, 0, 1)
            )
            .unsqueeze(0)
            .type(torch.FloatTensor)
        )
        loc, conf, landms = net(x)
        boxes = ref["bbox"].decode(
            loc.data.squeeze(0), anchors_t, ref_cfg["variance"]
        )
        conf = conf.data.squeeze(0)[:, 1:2]
        landms = ref["bbox"].decode_landm(
            landms.data.squeeze(0), anchors_t, ref_cfg["variance"]
        )
        dets = torch.cat([boxes, conf, landms], -1)
        n_cand = int((dets[:, 4] >= confidence).sum())
        dets = ref["bbox"].non_max_suppression(dets, confidence)
        if len(dets) <= 0:
            return np.zeros((0, 15), np.float32), n_cand
        dets = ref["bbox"].retinaface_correct_boxes(
            dets,
            np.array([INPUT, INPUT]),
            np.array([im_height, im_width]),
        )
    dets[:, :4] = dets[:, :4] * scale
    dets[:, 5:] = dets[:, 5:] * scale_lm
    return np.asarray(dets, np.float32), n_cand


def _build_ours(preset, probe_images, cap_cand=4000):
    """Random-init model whose class heads are biased so every test image
    has an INTERIOR number of anchors (a few hundred to cap_cand)
    clearing the 0.5 confidence gate at the 1280^2 eval shape.

    The bias must be chosen ADAPTIVELY: head-input feature magnitudes
    differ wildly across presets (measured logit-margin tails: mnet025
    max 0.12, re50_eca_nonlocal max 12.4), so any static bias lights up
    one preset and zeroes another. Probing a SEPARATE image doesn't
    transfer either — per-image tail-quantile drift exceeds the
    beyond-quantile mass, so a quantile from one image can zero another.
    The probe forwards the actual test images (letterboxed) with zero
    head bias and shifts the margin distribution by the MAX over
    per-image (1 - cap/N) quantiles: every image's candidate count is
    <= cap_cand by construction (so neither pre_nms_topk nor
    max_detections truncates), and the measured tail shapes keep every
    image's count comfortably above the >=5 assert.

    The margin SPREAD is normalized too (class logits are linear in the
    head kernel, so scaling the kernel scales every margin): the
    above-cut spread maps to ~1.5 logits. Without this, mnet025's tiny
    raw spread (0.12) puts every score within 0.008 of the 0.5 gate —
    no gate-flip-invariant comparison band exists — while leaving re50's
    raw 12-logit spread would saturate scores into float ties that make
    the NMS visit order ambiguous across frameworks."""
    from jabd_tpu.ops.image import letterbox_np, preprocess_input_np

    mcfg = dataclasses.replace(
        configs.get_model_config(preset), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    variables = jax.jit(lambda r, i: model.init(r, i, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    params = variables["params"]
    for i in range(1, mcfg.num_levels + 1):
        head = params[f"class_head{i}"]["conv1x1"]
        head["kernel"] = head["kernel"] * 0.2
        head["bias"] = jnp.zeros_like(head["bias"])

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    qs, maxes = [], []
    for img in probe_images:
        x = preprocess_input_np(
            letterbox_np(img, (INPUT, INPUT)).astype(np.float32)
        )
        out = fwd(variables, jnp.asarray(x)[None])
        p = np.asarray(out[1][0, :, 1], np.float64).clip(1e-9, 1 - 1e-9)
        margin = np.log(p) - np.log1p(-p)  # logit_face - logit_bg
        qs.append(float(np.quantile(margin, 1.0 - cap_cand / p.size)))
        maxes.append(float(margin.max()))
    q = max(qs)
    s = min(1.5 / max(max(maxes) - q, 1e-6), 1000.0)
    for i in range(1, mcfg.num_levels + 1):
        head = params[f"class_head{i}"]["conv1x1"]
        head["kernel"] = head["kernel"] * s
        head["bias"] = jnp.tile(
            jnp.asarray([q * s / 2.0, -q * s / 2.0], head["bias"].dtype), 2
        )
    return mcfg, variables


def _to_rows(dets_px):
    """[N, 15] pixel dets -> evaluator rows [x, y, w, h, score], score
    desc (run_wider.to_rows semantics)."""
    if len(dets_px) == 0:
        return np.zeros((0, 5), np.float32)
    rows = np.stack(
        [
            dets_px[:, 0],
            dets_px[:, 1],
            dets_px[:, 2] - dets_px[:, 0],
            dets_px[:, 3] - dets_px[:, 1],
            dets_px[:, 4],
        ],
        axis=1,
    )
    return rows[np.argsort(-rows[:, 4], kind="stable")]


def _dump(out_dir, event, stem, rows):
    d = os.path.join(out_dir, event)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, stem + ".txt"), "w") as f:
        f.write(f"{event}/{stem}.jpg\n{len(rows)}\n")
        for r in rows:
            f.write(
                f"{r[0]:.3f} {r[1]:.3f} {r[2]:.3f} {r[3]:.3f} {r[4]:.5f}\n"
            )


def _ref_evaluation_aps(ref, pred_dir, gt_dir):
    """Run the reference's WHOLE evaluation() (utils_map.py:173-223) and
    parse the printed Easy/Medium/Hard APs (it returns None)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ref["map"].evaluation(pred_dir, gt_dir)
    out = buf.getvalue()
    aps = {}
    for name in ("Easy", "Medium", "Hard"):
        mt = re.search(rf"{name}\s+Val AP:\s*([0-9.eE+-]+)", out)
        assert mt, f"reference evaluation printed no {name} AP:\n{out}"
        aps[name.lower()] = float(mt.group(1))
    return aps


def _match_sets(oh, rh, iou_min=0.99, score_atol=2e-3):
    """Greedy one-to-one matching between two [N, 15] det sets: a pair
    matches when box IoU >= iou_min AND scores agree within score_atol.
    Returns the matched count (vectorized IoU matrix; both sets are a
    few hundred rows).

    score_atol 2e-3: the spread normalization in _build_ours multiplies
    the class-head kernel by up to ~45x (mnet025), which amplifies
    cross-framework f32 logit noise the same amount — measured score
    disagreement reaches ~5e-4 there (27/234 boxes missed a 2e-4 gate).
    2e-3 sits well above that noise and well below typical inter-box
    score gaps; box identity is carried by the IoU >= 0.99 constraint
    anyway."""
    if len(oh) == 0 or len(rh) == 0:
        return 0
    a, b = rh[:, :4], oh[:, :4]
    ix = np.maximum(
        0.0,
        np.minimum(a[:, None, 2], b[None, :, 2])
        - np.maximum(a[:, None, 0], b[None, :, 0]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(a[:, None, 3], b[None, :, 3])
        - np.maximum(a[:, None, 1], b[None, :, 1]),
    )
    inter = ix * iy
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    iou = inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)
    ok = (iou >= iou_min) & (
        np.abs(rh[:, 4:5] - oh[None, :, 4]) <= score_atol
    )
    used = np.zeros(len(oh), bool)
    matched = 0
    for i in range(len(rh)):
        js = np.nonzero(ok[i] & ~used)[0]
        if len(js):
            used[js[0]] = True
            matched += 1
    return matched


CASES = {
    # preset -> (reference module key, reference cfg name, dead-param
    # prefixes allowed missing on strict load, #images, cap_cand).
    #
    # cap_cand is per-preset: mnet025's raw logit-margin distribution is
    # so FLAT (spread 0.12 over 67k anchors) that at 4000 candidates the
    # inter-candidate score gaps (~8e-6) sit below cross-framework f32
    # noise, making the NMS visit ORDER itself irreproducible (measured:
    # 27/234 high-band keeps without geometric twins). 500 candidates
    # widen the gaps past the noise while keeping every image's count
    # interior (measured counts [234, 482, 50]).
    "retinaface_mnet025": ("vanilla", "cfg_mnet025", (), 3, 500),
    # predict.py's model (nets/retinaface_eca_nonlocal.py:235): dead
    # RetinaFace-level Nlm (:279, forward use commented :339-341) and the
    # dead IouHead pair (:299-306, never called in forward).
    "re50_eca_nonlocal": ("eca_nl", "cfg_re50", ("Nlm.", "IouHead."), 2, 4000),
    # module-form JABD (nets/retinaface_r.py): Block_eca constructs SE it
    # never applies (nets/mobilenetV3.py:94-150 — the documented quirk),
    # so every block carries dead se.* params.
    "retinaface_r": ("r", "cfg_mnet", (".se.",), 3, 4000),
}


@pytest.mark.parametrize("preset", sorted(CASES))
def test_full_pipeline_parity_and_ap(preset, tmp_path, rng, ref):
    mod_key, cfg_name, dead_ok, n_images, cap_cand = CASES[preset]

    # --- mixed-size val images (exercises letterbox + correct_boxes);
    # generated FIRST: the head-bias probe forwards these exact images
    event = "0--Parade"
    sizes = [(720, 1080), (1000, 760), (640, 640)][:n_images]
    images = {
        f"img_{i}": rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        for i, (h, w) in enumerate(sizes)
    }

    # --- shared weights: ours -> exported -> the reference's own module
    mcfg, variables = _build_ours(
        preset, list(images.values()), cap_cand=cap_cand
    )
    sd = export_state_dict_auto(variables, mcfg)
    if cfg_name == "cfg_mnet025":
        from tests.test_reference_backbones import _MNET025_CFG as ref_cfg
    else:
        ref_cfg = getattr(ref["config"], cfg_name)
    net = (
        ref[mod_key]
        .RetinaFace(cfg=ref_cfg, pretrained=False, mode="eval")
        .eval()
    )
    res = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert res.unexpected_keys == [], res.unexpected_keys
    bad = [
        k
        for k in res.missing_keys
        if not any(p in k for p in dead_ok)
    ]
    assert bad == [], f"non-dead missing keys: {bad[:8]}"

    anchors_t = (
        ref["anchors"].Anchors(ref_cfg, image_size=(INPUT, INPUT)).get_anchors()
    )

    # nms_iou 0.3, NOT the 0.45 in the reference's own config dict: every
    # reference call site passes only the confidence
    # (predict.py:181,303,329,399 `non_max_suppression(dets,
    # self.confidence)`), so the declared "nms_iou": 0.45 is DEAD and the
    # effective threshold is the function default 0.3
    # (utils_bbox.py:260). First found by this test: 519 vs 181 keeps.
    pcfg = configs.PredictConfig(
        confidence=0.5,
        nms_iou=0.3,
        input_shape=(INPUT, INPUT),
        max_detections=4096,  # > _build_ours cap_cand: keeps never clip
        pre_nms_topk=16384,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False, fold_bn=False)

    ours_dir = str(tmp_path / "ours")
    ref_dir = str(tmp_path / "ref")
    gt_events = {event: {}}
    for stem, img in images.items():
        d_ours = pred.detect_image(img)
        d_ref, n_cand = _ref_get_map_txt(
            ref, net, ref_cfg, anchors_t, img, pcfg.confidence
        )
        # the fixed-shape device NMS truncates at pre_nms_topk /
        # max_detections — parity is only meaningful when the reference's
        # unbounded candidate set fits inside both
        assert n_cand < pcfg.pre_nms_topk, (stem, n_cand)
        assert len(d_ref) < pcfg.max_detections, (stem, len(d_ref))

        # Keep-set comparison. The pipelines share two measure-zero
        # decision boundaries no cross-framework run can pin exactly in
        # f32: the 0.5 confidence gate (observed: 820 vs 821 keeps, one
        # borderline box) and the NMS IoU threshold (observed: one pair
        # at IoU 0.3 +- association error suppressing on one side only).
        # So the assertion is keep-set equality MODULO a tight boundary
        # budget: in the gate-flip-invariant band (score >= gate + eps;
        # NMS suppression flows strictly from higher scores to lower, so
        # sub-gate flips can't reshape this band) every box must find
        # its twin (IoU >= 0.99, score within 2e-3) with at most 2
        # boundary flips per image, and full counts within 3. The AP
        # asserts below then pin the end metric on the complete dumps.
        eps = 0.01
        o = d_ours[np.argsort(-d_ours[:, 4], kind="stable")]
        r = d_ref[np.argsort(-d_ref[:, 4], kind="stable")]
        # Drop letterbox-PAD detections (box center outside the source
        # image) from the set comparison: the pad is uniform fill-84, so
        # a whole anchor row there scores BITWISE-EQUAL (measured:
        # mnet025 img_0 had 9 keeps all at score 0.54130, y-row 861-890
        # on a 720-tall image) and the NMS survivor comb among exact
        # ties is pure tie-break order — undefined across frameworks
        # (torchvision's own tie order is device-dependent). A trained
        # detector never fires on uniform pad; random-init + biased
        # heads do. Real-image keeps still exercise the full
        # letterbox/correct_boxes geometry.
        h_img, w_img = img.shape[:2]

        def _in_image(d):
            cx = (d[:, 0] + d[:, 2]) / 2.0
            cy = (d[:, 1] + d[:, 3]) / 2.0
            return d[(cx >= 0) & (cx <= w_img) & (cy >= 0) & (cy <= h_img)]

        o, r = _in_image(o), _in_image(r)
        assert abs(len(o) - len(r)) <= 3, (
            f"{stem}: {len(o)} vs {len(r)} detections"
        )
        oh = o[o[:, 4] >= pcfg.confidence + eps]
        rh = r[r[:, 4] >= pcfg.confidence + eps]
        assert len(rh) >= 5, f"{stem}: only {len(rh)} high-band detections"
        matched = _match_sets(oh, rh)
        assert len(rh) - matched <= 2, (
            f"{stem}: {len(rh) - matched} ref high-band boxes unmatched"
        )
        assert len(oh) - matched <= 2, (
            f"{stem}: {len(oh) - matched} of our high-band boxes unmatched"
        )

        rows = _to_rows(d_ours)
        _dump(ours_dir, event, stem, rows)
        _dump(ref_dir, event, stem, _to_rows(d_ref))

        # GT from our top detections (so recall/precision are interior)
        # + one unmatched distractor per image.
        top = rows[:2, :4]
        h, w = img.shape[:2]
        distract = np.array([[1.0, 1.0, 12.0, 12.0]])
        gt_events[event][stem] = np.concatenate([top, distract]).tolist()

    gt_dir = _fake_gt_dir(tmp_path, gt_events)

    # --- AP through BOTH evaluators on BOTH dumps
    from jabd_tpu.eval import evaluate_wider

    aps = {
        ("ours", "ours_eval"): evaluate_wider(ours_dir, gt_dir),
        ("ref", "ours_eval"): evaluate_wider(ref_dir, gt_dir),
        ("ours", "ref_eval"): _ref_evaluation_aps(ref, ours_dir, gt_dir),
        ("ref", "ref_eval"): _ref_evaluation_aps(ref, ref_dir, gt_dir),
    }
    for setting in ("easy", "medium", "hard"):
        vals = [aps[k][setting] for k in aps]
        assert 0.0 < vals[0] < 1.0, (setting, vals)  # interior, non-vacuous
        assert max(vals) - min(vals) < 1e-3, (setting, vals, aps)
