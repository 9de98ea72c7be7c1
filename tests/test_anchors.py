"""Anchor generator parity with the reference Python loop.

Expected counts documented at utils/anchors.py:86 and utils/config.py:3-4.
"""

import math
from itertools import product

import numpy as np

from jabd_tpu import configs
from jabd_tpu.ops import anchors as A


def reference_anchors(cfg: configs.AnchorConfig, image_size):
    """Literal port of utils/anchors.py:23-42 (torch-free golden model)."""
    feature_maps = [
        [math.ceil(image_size[0] / step), math.ceil(image_size[1] / step)]
        for step in cfg.steps
    ]
    out = []
    for k, f in enumerate(feature_maps):
        min_sizes = cfg.min_sizes[k]
        for i, j in product(range(f[0]), range(f[1])):
            for m in min_sizes:
                s_kx = m / image_size[1]
                s_ky = m / image_size[0]
                cx = (j + 0.5) * cfg.steps[k] / image_size[1]
                cy = (i + 0.5) * cfg.steps[k] / image_size[0]
                out.append([cx, cy, s_kx, s_ky])
    a = np.asarray(out, dtype=np.float32)
    if cfg.clip:
        a = np.clip(a, 0, 1)
    return a


def test_count_mnet_840():
    # (105^2 + 53^2 + 27^2) * 2 = 29126
    assert A.num_anchors(configs.CFG_MNET, (840, 840)) == 29126
    assert A.generate_anchors(configs.CFG_MNET, (840, 840)).shape == (
        29126,
        4,
    )


def test_count_predict_1280():
    assert A.num_anchors(configs.CFG_MNET, (1280, 1280)) == 67200


def test_count_re50_self_4level():
    # utils/anchors.py:86 comment: 29518 anchors.
    assert A.num_anchors(configs.CFG_RE50_SELF, (840, 840)) == 29518


def test_values_match_reference_loop():
    for cfg, size in [
        (configs.CFG_MNET, (840, 840)),
        (configs.CFG_MNET_4, (840, 840)),
        (configs.CFG_RE50_SELF, (840, 840)),
        (configs.CFG_RE101, (640, 512)),
    ]:
        got = A.generate_anchors(cfg, size)
        want = reference_anchors(cfg, size)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_clip():
    cfg = configs.AnchorConfig(
        min_sizes=((256, 512),), steps=(32,), clip=True
    )
    a = A.generate_anchors(cfg, (256, 256))
    assert a.min() >= 0.0 and a.max() <= 1.0
