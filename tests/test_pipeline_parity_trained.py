"""Full-pipeline parity at TRAINED weights (VERDICT r4 ask #3).

tests/test_pipeline_parity.py pins the complete 1280^2 pipeline against
the reference's own torch modules — but on adaptively-biased RANDOM
weights, whose BN statistics and score distributions are nothing like a
trained detector's. This module re-runs the same comparison from
COMMITTED trained checkpoints (the golden-fixture mnet025 and the
trained_parity retinaface_r, both trained by the production
train.make_train_step on synthetic bright-square faces, f16-rounded so
both frameworks load bit-identical values):

  reference: letterbox_image -> preprocess_input -> the reference's OWN
    RetinaFace forward (predict.py:115-251,338-415 semantics via
    _ref_get_map_txt) -> decode -> non_max_suppression ->
    retinaface_correct_boxes;
  ours: Predictor.detect_image.

Trained weights make the comparison REALISTIC where the random-init
test is synthetic: running BN statistics are learned (not init ones),
score distributions are bimodal with real separation (measured: face
anchors 0.95-0.999, background < 1e-3, no adaptively-chosen bias), and
the detections sit on actual objects, so letterbox/correct_boxes
geometry is exercised where a trained detector fires. Asserted per
image: keep-set equality on real-image detections (IoU >= 0.99 + score
within 2e-3, <= 2 boundary flips), counts within 3; per assembly:
Easy/Medium/Hard AP equal within 1e-3 across BOTH pipelines and BOTH
evaluators, with GT = the true synthetic squares (+1 distractor so AP
is interior).
"""

import dataclasses
import os

import numpy as np
import pytest

from jabd_tpu import configs
from jabd_tpu.predict import Predictor

# shared helpers + the module-scoped reference-import fixture
from tests.test_pipeline_parity import (  # noqa: F401
    INPUT,
    REF_ROOT,
    _dump,
    _match_sets,
    _ref_evaluation_aps,
    _ref_get_map_txt,
    _to_rows,
    ref,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF_ROOT), reason="reference tree not mounted"
    ),
]

torch = pytest.importorskip("torch")

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

# preset -> (ckpt relpath, reference module key, reference cfg name,
#            dead-param prefixes allowed missing on strict load)
TRAINED = {
    "retinaface_mnet025": (
        "golden_e2e/ckpt_mnet025_96.npz",
        "vanilla",
        "cfg_mnet025",
        (),
    ),
    # module-form JABD (nets/retinaface_r.py); Block_eca's constructed-
    # but-never-applied SE params are dead on the torch side
    "retinaface_r": (
        "trained_parity/ckpt_retinaface_r_96.npz",
        "r",
        "cfg_mnet",
        (".se.",),
    ),
}


def load_trained_variables(preset):
    """(f32 model config, variables) from the committed trained npz."""
    import jax
    import jax.numpy as jnp

    from jabd_tpu.models import build_model
    from jabd_tpu.utils.np_ckpt import load_variables_npz

    path = os.path.join(FIXTURES, TRAINED[preset][0])
    if not os.path.exists(path):
        pytest.skip(f"trained fixture missing: {path}")
    mcfg = dataclasses.replace(
        configs.get_model_config(preset), compute_dtype="float32"
    )
    model = build_model(mcfg, mode="eval")
    template = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 96, 96, 3), jnp.float32),
    )
    return mcfg, load_variables_npz(path, template)


def parity_images(n=3):
    """Deterministic mixed-size uint8 square-face images for the 1280^2
    operating point. Source sizes put the squares at 24-40 INPUT px
    after letterbox (the checkpoints' 16-40 px training distribution):
    960x1280 -> scale 1.0, 720x1080 -> 1.185, 640x640 -> 2.0. Returns
    {stem: (image_u8, gt list of [x, y, w, h])}."""
    rng = np.random.default_rng(3)
    out = {}
    for i, (h, w) in enumerate([(960, 1280), (720, 1080), (640, 640)][:n]):
        scale = INPUT / max(h, w)
        img = np.full((h, w, 3), 30, np.uint8) + rng.integers(
            0, 12, (h, w, 3)
        ).astype(np.uint8)
        gt = []
        for _ in range(6 - i):
            s = int(rng.integers(24, 40) / scale)
            x = int(rng.integers(0, w - s))
            y = int(rng.integers(0, h - s))
            img[y : y + s, x : x + s] = int(rng.uniform(150, 230))
            gt.append([float(x), float(y), float(s), float(s)])
        out[f"img_{i}"] = (img, gt)
    return out


@pytest.mark.parametrize("preset", sorted(TRAINED))
def test_trained_pipeline_parity_and_ap(preset, tmp_path, ref):  # noqa: F811
    _, mod_key, cfg_name, dead_ok = TRAINED[preset]
    mcfg, variables = load_trained_variables(preset)

    # --- our weights -> the reference's own module, strict load
    from jabd_tpu.utils.torch_convert import export_state_dict_auto

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
    bad = [k for k in res.missing_keys if not any(p in k for p in dead_ok)]
    assert bad == [], f"non-dead missing keys: {bad[:8]}"

    anchors_t = (
        ref["anchors"].Anchors(ref_cfg, image_size=(INPUT, INPUT)).get_anchors()
    )
    pcfg = configs.PredictConfig(
        confidence=0.5,
        nms_iou=0.3,  # the reference's EFFECTIVE threshold (dead cfg key)
        input_shape=(INPUT, INPUT),
        max_detections=4096,
        pre_nms_topk=16384,
    )
    pred = Predictor(mcfg, variables, pcfg, use_pallas=False, fold_bn=False)

    event = "0--Trained"
    ours_dir, ref_dir = str(tmp_path / "ours"), str(tmp_path / "ref")
    gt_events = {event: {}}
    for stem, (img, gt) in parity_images().items():
        imgf = img.astype(np.float32)
        d_ours = np.asarray(pred.detect_image(imgf))
        d_ref, n_cand = _ref_get_map_txt(
            ref, net, ref_cfg, anchors_t, imgf, pcfg.confidence
        )
        assert n_cand < pcfg.pre_nms_topk, (stem, n_cand)
        assert len(d_ref) < pcfg.max_detections, (stem, len(d_ref))

        # Drop letterbox-pad detections (center outside the source
        # image) exactly as in the random-init test: the uniform pad
        # produces bitwise score TIES whose NMS survivor order is
        # undefined across frameworks. Trained weights still fire
        # weakly on pad edges (measured ~0.98 there).
        h_img, w_img = img.shape[:2]

        def _in_image(d):
            cx = (d[:, 0] + d[:, 2]) / 2.0
            cy = (d[:, 1] + d[:, 3]) / 2.0
            return d[(cx >= 0) & (cx <= w_img) & (cy >= 0) & (cy <= h_img)]

        o = _in_image(d_ours[np.argsort(-d_ours[:, 4], kind="stable")])
        r = _in_image(d_ref[np.argsort(-d_ref[:, 4], kind="stable")])
        assert abs(len(o) - len(r)) <= 3, (
            f"{stem}: {len(o)} vs {len(r)} detections"
        )
        eps = 0.01
        oh = o[o[:, 4] >= pcfg.confidence + eps]
        rh = r[r[:, 4] >= pcfg.confidence + eps]
        assert len(rh) >= len(gt), f"{stem}: {len(rh)} < {len(gt)} gt"
        matched = _match_sets(oh, rh)
        assert len(rh) - matched <= 2, (
            f"{stem}: {len(rh) - matched} ref high-band boxes unmatched"
        )
        assert len(oh) - matched <= 2, (
            f"{stem}: {len(oh) - matched} of our high-band boxes unmatched"
        )

        # the trained detector actually FOUND the faces: every true
        # square is covered by a high-band detection (IoU >= 0.5)
        gtb = np.asarray(gt, np.float32)
        gxyxy = np.stack(
            [gtb[:, 0], gtb[:, 1], gtb[:, 0] + gtb[:, 2], gtb[:, 1] + gtb[:, 3]],
            1,
        )
        for gb in gxyxy:
            ix = np.maximum(
                0,
                np.minimum(oh[:, 2], gb[2]) - np.maximum(oh[:, 0], gb[0]),
            )
            iy = np.maximum(
                0,
                np.minimum(oh[:, 3], gb[3]) - np.maximum(oh[:, 1], gb[1]),
            )
            inter = ix * iy
            ga = (gb[2] - gb[0]) * (gb[3] - gb[1])
            oa = (oh[:, 2] - oh[:, 0]) * (oh[:, 3] - oh[:, 1])
            iou = inter / np.maximum(ga + oa - inter, 1e-12)
            assert iou.max() >= 0.5, (stem, gb, float(iou.max()))

        _dump(ours_dir, event, stem, _to_rows(d_ours))
        _dump(ref_dir, event, stem, _to_rows(d_ref))
        # GT: the real squares + one distractor nothing detects, so
        # recall < 1 and the AP is interior
        gt_events[event][stem] = gt + [[1.0, 1.0, 12.0, 12.0]]

    from tests.test_eval import _fake_gt_dir

    gt_dir = _fake_gt_dir(tmp_path, gt_events)

    from jabd_tpu.eval import evaluate_wider

    aps = {
        ("ours", "ours_eval"): evaluate_wider(ours_dir, gt_dir),
        ("ref", "ours_eval"): evaluate_wider(ref_dir, gt_dir),
        ("ours", "ref_eval"): _ref_evaluation_aps(ref, ours_dir, gt_dir),
        ("ref", "ref_eval"): _ref_evaluation_aps(ref, ref_dir, gt_dir),
    }
    for setting in ("easy", "medium", "hard"):
        vals = [aps[k][setting] for k in aps]
        assert 0.0 < vals[0] < 1.0, (setting, vals)
        assert max(vals) - min(vals) < 1e-3, (setting, vals, aps)
