"""IR backbone BN folding (recognition/fold.py) and int8 quantization.

Fold must be EXACT vs the unfolded eval graph (same guarantee as the
detection fold tests); int8 embeddings must stay directionally faithful
(high cosine similarity) to the folded float graph.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jabd_tpu.models import quantize as Q
from jabd_tpu.recognition import build_model
from jabd_tpu.recognition.fold import fold_ir


def _perturb_stats(variables, rng):
    def f(path, a):
        s = "/".join(str(p) for p in path)
        if "mean" in s:
            return a + jnp.asarray(rng.normal(0, 0.2, a.shape), a.dtype)
        if "var" in s:
            return a * 1.6 + 0.05
        return a

    bs = jax.tree_util.tree_map_with_path(f, variables["batch_stats"])
    return {**variables, "batch_stats": bs}


@pytest.mark.parametrize("arch", ["ir_18", "ir_se_18"])
def test_fold_ir_exact(arch):
    model = build_model(arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 112, 112, 3)), jnp.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    v = _perturb_stats(v, rng)

    ref_emb, ref_norm = jax.jit(
        lambda vv: model.apply(vv, x, train=False)
    )(v)
    folded = fold_ir(v)
    # Every directly-consumed BN must be gone from the stats tree.
    flat = jax.tree_util.tree_flatten_with_path(
        folded.get("batch_stats", {})
    )[0]
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    for gone in ("bn1", "bn2", "shortcut_bn", "input_bn", "features_bn"):
        assert not any(gone in n for n in names), (gone, sorted(names)[:5])
    assert any("bn0" in n for n in names)  # pre-activation BNs stay

    got_emb, got_norm = jax.jit(
        lambda vv: model.apply(vv, x, train=False)
    )(folded)
    np.testing.assert_allclose(
        np.asarray(got_emb), np.asarray(ref_emb), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_norm), np.asarray(ref_norm), rtol=2e-4, atol=2e-4
    )


def test_ir_int8_embeddings_close():
    model = build_model("ir_18")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (4, 112, 112, 3)), jnp.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    v = _perturb_stats(v, rng)
    folded = fold_ir(v)

    calib = Q.calibrate(model, folded, [x])
    qvars, n = Q.quantize_variables(folded, calib)
    # ir_18: input_conv + 8 blocks x (conv1, conv2) + 3 stride shortcuts
    assert n >= 15, n

    ref_emb, _ = jax.jit(lambda vv: model.apply(vv, x, train=False))(folded)
    got_emb, _ = jax.jit(lambda vv: model.apply(vv, x, train=False))(qvars)
    cos = np.sum(
        np.asarray(ref_emb) * np.asarray(got_emb), axis=1
    )  # both l2-normalized
    assert np.all(cos > 0.98), cos


def test_fc_dense_folded_and_quantized():
    """features_bn folds into fc (2-D kernel) and the Dense runs int8
    (per-output-column scales) alongside the convs."""
    model = build_model("ir_18")
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    folded = fold_ir(v)
    assert "features_bn" not in folded.get("batch_stats", {})
    calib = Q.calibrate(model, folded, [jnp.ones_like(x)])
    qvars, _ = Q.quantize_variables(folded, calib)
    fc = qvars["params"]["fc"]
    assert "kernel_q" in fc and fc["kernel_q"].ndim == 2
    assert fc["w_scale"].shape == (512,)
