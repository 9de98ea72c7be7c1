"""Model graph tests: output shapes vs anchor counts across presets,
eval-mode softmax, NLM identity-at-init, dtype policy."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.models import layers as L
from jabd_tpu.ops import anchors as A

pytestmark = pytest.mark.slow  # compile-heavy module



def _init_and_run(cfg, image_size=128, mode="train", batch=1):
    import functools

    model = build_model(cfg, mode=mode)
    x = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    # Always jit init/apply: eager-mode per-op PRNG dispatch is pathologically
    # slow on this CPU backend (~270s per init un-jitted).
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x
    )
    out = jax.jit(functools.partial(model.apply, train=False))(variables, x)
    return out, variables


@pytest.mark.parametrize(
    "preset", ["jabd_flagship", "mnet_v3_plain", "retinaface_mnet025"]
)
def test_output_shapes_match_anchors(preset):
    cfg = dataclasses.replace(
        configs.get_model_config(preset), compute_dtype="float32"
    )
    size = 128
    n = A.num_anchors(cfg.anchors, (size, size))
    (bbox, cls, landm), _ = _init_and_run(cfg, size)
    assert bbox.shape == (1, n, 4)
    assert cls.shape == (1, n, 2)
    assert landm.shape == (1, n, 10)
    assert bbox.dtype == jnp.float32


def test_4level_shapes():
    cfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_4level"), compute_dtype="float32"
    )
    size = 128
    n = A.num_anchors(cfg.anchors, (size, size))
    (bbox, cls, landm), _ = _init_and_run(cfg, size)
    assert bbox.shape == (1, n, 4)


def test_eval_mode_softmax():
    cfg = dataclasses.replace(
        configs.get_model_config("mnet_v3_plain"), compute_dtype="float32"
    )
    (_, cls, _), _ = _init_and_run(cfg, 64, mode="eval")
    s = np.asarray(jnp.sum(cls, axis=-1))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)


def test_nlm_identity_at_init(rng):
    """Zero-init W => NLM(x) == x at init
    (nets/retinaface_eca_nonlocal.py:168-170)."""
    x = jnp.asarray(rng.normal(size=(2, 13, 13, 40)).astype(np.float32))
    nlm = L.NLM(ch=40, psp_sizes=(1, 3, 6, 8))
    v = nlm.init(jax.random.PRNGKey(0), x)
    y = nlm.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_ssh_channel_split(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 40)).astype(np.float32))
    ssh = L.SSH(out_channels=40)
    v = ssh.init(jax.random.PRNGKey(0), x, train=False)
    y = ssh.apply(v, x, train=False)
    assert y.shape == (1, 8, 8, 40)
    assert np.asarray(y).min() >= 0.0  # final ReLU


def test_eca_preserves_shape_and_gates(rng):
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 80)).astype(np.float32))
    for stat in ("avg", "stdv"):
        for gate in ("sigmoid", "hsigmoid"):
            eca = L.ECA(statistic=stat, gate=gate)
            v = eca.init(jax.random.PRNGKey(0), x)
            y = np.asarray(eca.apply(v, x))
            assert y.shape == x.shape
            # Gate in [0,1] => |y| <= |x|.
            assert (np.abs(y) <= np.abs(np.asarray(x)) + 1e-6).all()


def test_bf16_compute_f32_out():
    cfg = configs.get_model_config("mnet_v3_plain")  # bf16 default
    (bbox, cls, landm), variables = _init_and_run(cfg, 64)
    assert bbox.dtype == jnp.float32
    # Params stay f32.
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
