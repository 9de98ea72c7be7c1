"""BatchNorm folding (models/fold.py) parity tests.

Fold must be exact (f32 tolerance) vs the unfolded eval graph: the three
folded patterns individually, plus the full flagship assembly.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.models.fold import fold_batchnorm
from jabd_tpu.models.layers import ConvBN, SEModule
from jabd_tpu.models.mobilenet import MNV3Block


def _perturb_stats(variables, rng):
    """Give running stats non-trivial values so folding isn't identity."""

    def f(path, a):
        s = "/".join(str(p) for p in path)
        if "mean" in s:
            return a + jnp.asarray(rng.normal(0, 0.2, a.shape), a.dtype)
        if "var" in s:
            return a * 1.7 + 0.03
        return a

    bs = jax.tree_util.tree_map_with_path(f, variables["batch_stats"])
    return {**variables, "batch_stats": bs}


def _fold_roundtrip(module, x, rng, atol):
    v = module.init(jax.random.PRNGKey(0), x, train=False)
    v = _perturb_stats(v, rng)
    ref = module.apply(v, x, train=False)
    out = module.apply(fold_batchnorm(v), x, train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=atol, rtol=0
    )


def test_convbn_fold(rng):
    x = jnp.asarray(rng.normal(0, 3, (2, 8, 8, 16)).astype(np.float32))
    _fold_roundtrip(ConvBN(24, 3, act=0.1), x, rng, atol=2e-5)


def test_semodule_fold(rng):
    x = jnp.asarray(rng.normal(0, 3, (2, 8, 8, 32)).astype(np.float32))
    _fold_roundtrip(SEModule(), x, rng, atol=2e-5)


def test_mnv3block_stride2_skip_fold(rng):
    # stride 2, in != out exercises the skip_pw + skip_pw_bn pattern.
    x = jnp.asarray(rng.normal(0, 3, (2, 16, 16, 24)).astype(np.float32))
    blk = MNV3Block(
        kernel=3, in_size=24, expand=72, out=40, act="relu", se=True,
        stride=2,
    )
    _fold_roundtrip(blk, x, rng, atol=2e-5)


def test_flagship_fold_parity(rng):
    cfg = dataclasses.replace(
        configs.get_model_config("jabd_flagship"), compute_dtype="float32"
    )
    model = build_model(cfg, mode="eval")
    x = jnp.asarray(rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32))
    v = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x
    )
    v = _perturb_stats(v, rng)
    ref = model.apply(v, x, train=False)
    fv = fold_batchnorm(v)
    # Every detection BN folds away for this preset.
    assert "batch_stats" not in fv
    leaves = jax.tree_util.tree_leaves_with_path(fv["params"])
    assert not any("bn" in "/".join(map(str, p)) for p, _ in leaves)
    out = model.apply(fv, x, train=False)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5, rtol=0
        )


def test_fold_bf16_cast_matches_runtime_cast(rng):
    """Pre-cast folded bf16 weights == Flax runtime cast of f32 weights."""
    x = jnp.asarray(rng.normal(0, 3, (2, 8, 8, 16)).astype(np.float32))
    mod = ConvBN(24, 3, act=0.1, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    v = _perturb_stats(v, rng)
    folded = fold_batchnorm(v)
    a = mod.apply(folded, x, train=False)
    b = mod.apply(fold_batchnorm(v, cast=jnp.bfloat16), x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_apply_unchanged(rng):
    """Unfolded variables still run the normal BN train path."""
    x = jnp.asarray(rng.normal(0, 3, (2, 8, 8, 16)).astype(np.float32))
    mod = ConvBN(24, 3, act=0.1)
    v = mod.init(jax.random.PRNGKey(0), x, train=True)
    y, mut = mod.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut
