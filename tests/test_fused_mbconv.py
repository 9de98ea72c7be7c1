"""Parity tests for the experimental fused expand+depthwise kernel
(interpret mode on CPU) against the composed XLA reference, including the
border-halo semantics (zero padding AFTER expand+act, not before)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jabd_tpu.ops.fused_mbconv import (
    fold_bn,
    fused_expand_dw,
    reference_expand_dw,
)


@pytest.mark.parametrize("act", ["relu", "hswish"])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 12, 24, 72),  # multi-batch, non-aligned W
        (1, 8, 8, 16, 64),  # multi-tile rows
        (1, 4, 4, 8, 16),  # single tile
    ],
)
def test_fused_matches_reference(rng, act, shape):
    B, H, W, Cin, E = shape
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.1, (Cin, E)).astype(np.float32))
    wdw = jnp.asarray(rng.normal(0, 0.1, (3, 3, E)).astype(np.float32))
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, E).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, E).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, E).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, E).astype(np.float32))
    got = fused_expand_dw(
        x, w1, s1, b1, wdw, s2, b2, act=act, interpret=True
    )
    want = reference_expand_dw(x, w1, s1, b1, wdw, s2, b2, act)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fold_bn():
    gamma = jnp.asarray([2.0])
    beta = jnp.asarray([1.0])
    mean = jnp.asarray([0.5])
    var = jnp.asarray([4.0])
    scale, bias = fold_bn(gamma, beta, mean, var, eps=0.0)
    # BN(y) = gamma*(y-mean)/sqrt(var) + beta = y*1 + 0.5
    np.testing.assert_allclose(float(scale[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(bias[0]), 0.5, rtol=1e-6)
