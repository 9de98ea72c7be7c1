"""PixelShuffleUp (sub-pixel FPN upsample) tests.

The reference sketches this upsample in train_all_bicubic.py:231-271
(conv_layer + nn.PixelShuffle, never wired into forward); here it is a
first-class FPN option. Parity oracle: torch's own PixelShuffle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jabd_tpu import configs
from jabd_tpu.models import layers as L


def test_pixelshuffle_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, h, w, cin, cout, r = 2, 5, 7, 12, 6, 2
    x = rng.normal(0, 1, (b, h, w, cin)).astype(np.float32)

    mod = L.PixelShuffleUp(cout, factor=r)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(v, jnp.asarray(x)))

    # torch: conv(NCHW) -> PixelShuffle. HWIO -> OIHW.
    k = np.transpose(np.asarray(v["params"]["conv"]["kernel"]), (3, 2, 0, 1))
    conv = torch.nn.Conv2d(cin, cout * r * r, 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k))
        conv.bias.copy_(torch.from_numpy(np.asarray(v["params"]["conv"]["bias"])))
        t = conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t = torch.nn.PixelShuffle(r)(t)
    ref = t.numpy().transpose(0, 2, 3, 1)
    assert ref.shape == (b, h * r, w * r, cout)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_fpn_pixelshuffle_odd_grids(rng):
    """x2 shuffle + crop must land exactly on odd pyramid grids
    (840-> strides 8/16/32 gives 105/53/27: 27*2=54 crops to 53)."""
    fpn = L.FPN(out_channels=16, upsample="pixelshuffle")
    ins = [
        jnp.asarray(rng.normal(0, 1, (1, s, s, c)).astype(np.float32))
        for s, c in [(21, 24), (11, 40), (6, 64)]
    ]
    v = fpn.init(jax.random.PRNGKey(0), ins)
    outs = fpn.apply(v, ins)
    assert [o.shape[1] for o in outs] == [21, 11, 6]
    # One shared learned upsample module, like the reference's shared nlm.
    assert "pix" in v["params"]


def test_pixelshuffle_preset_registered():
    cfg = configs.get_model_config("jabd_pixelshuffle")
    assert cfg.fpn_upsample == "pixelshuffle"
    assert cfg.nlm.ch == 8
