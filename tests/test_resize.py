"""Resize/adaptive-pool parity against torch (the reference's numerics).

Covers the FPN upsample modes (nearest: nets/layers.py:106; bicubic
align_corners=True: train_mobilenetV3_ecagai.py:270,279) and the PSP
adaptive average pooling (nets/retinaface_eca_nonlocal.py:133-152).
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from jabd_tpu.ops import resize as R


def _torch_resize(x_nhwc, out_hw, mode, align_corners):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kw = {} if mode == "nearest" else {"align_corners": align_corners}
    y = F.interpolate(t, size=list(out_hw), mode=mode, **kw)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def _cases():
    # (in_hw, out_hw) pairs incl. the real FPN ladder at 840 and 1280 inputs.
    return [
        ((27, 27), (53, 53)),
        ((53, 53), (105, 105)),
        ((40, 40), (80, 80)),
        ((20, 20), (40, 40)),
        ((7, 5), (13, 11)),
    ]


def test_nearest_matches_torch(rng):
    for in_hw, out_hw in _cases():
        x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
        got = np.asarray(R.resize(jnp.asarray(x), out_hw, "nearest"))
        want = _torch_resize(x, out_hw, "nearest", None)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bicubic_align_corners_matches_torch(rng):
    for in_hw, out_hw in _cases():
        x = rng.normal(size=(1, *in_hw, 4)).astype(np.float32)
        got = np.asarray(R.resize(jnp.asarray(x), out_hw, "bicubic", True))
        want = _torch_resize(x, out_hw, "bicubic", True)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilinear_matches_torch(rng):
    for align in (True, False):
        x = rng.normal(size=(1, 16, 16, 2)).astype(np.float32)
        got = np.asarray(R.resize(jnp.asarray(x), (33, 33), "bilinear", align))
        want = _torch_resize(x, (33, 33), "bilinear", align)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_adaptive_avg_pool_matches_torch(rng):
    for out in (1, 3, 6, 8, 12):
        x = rng.normal(size=(2, 53, 53, 5)).astype(np.float32)
        got = np.asarray(R.adaptive_avg_pool(jnp.asarray(x), (out, out)))
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = np.transpose(
            F.adaptive_avg_pool2d(t, out).numpy(), (0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_identity_resize_is_noop(rng):
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    got = R.resize(jnp.asarray(x), (8, 8), "bicubic")
    np.testing.assert_array_equal(np.asarray(got), x)
