"""Hard-negative mining formulations microbench (round-3 lever hunt).

Three EXACT-equivalent ways to compute the mined-negative CE sum
sum(top-num_neg values of the positive-masked ranking loss) at flagship
train shapes [B=128, P=29126]:

  argsort2   - the reference's double-argsort rank trick (round-1/2 impl)
  value_sort - one descending value sort + prefix mask (round-3 impl)
  bisect     - no sort at all: per-image float bisection for the k-th
               largest value t, then sum(v>t) + (k - count(v>t)) * t.
               Exact: after ~50 halvings of [0, max] the bracket is below
               1 f32 ulp, so tied values equal t exactly and the
               correction term is the true tie completion.

Verifies all three agree, then times each with the chained harness.

Usage: python scripts/bench_mining.py [batch] [P] [iters]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def mined_argsort2(loss_rank, num_neg):
    loss_idx = jnp.argsort(-loss_rank, axis=-1)
    idx_rank = jnp.argsort(loss_idx, axis=-1)
    neg = idx_rank < num_neg
    return jnp.sum(jnp.where(neg, loss_rank, 0.0))


def mined_value_sort(loss_rank, num_neg):
    p = loss_rank.shape[-1]
    sorted_rank = -jnp.sort(-loss_rank, axis=-1)
    take = jnp.arange(p)[None, :] < num_neg
    return jnp.sum(jnp.where(take, sorted_rank, 0.0))


def mined_bisect(loss_rank, num_neg, iters=50):
    """Sum of top-k values via threshold bisection (no sort).

    Invariant: count(v > hi) <= k <= count(v > lo) + ties; converging the
    f32 bracket below 1 ulp makes t == the k-th largest value (or sits
    strictly between k-th and (k+1)-th), where
      S = sum(v * (v > t)) + (k - count(v > t)) * t
    is exactly the top-k sum (the correction counts ties at t).
    """
    k = num_neg.astype(jnp.float32)  # [B, 1]

    def count_gt(t):
        return jnp.sum(
            (loss_rank > t).astype(jnp.float32), axis=-1, keepdims=True
        )

    lo = jnp.zeros_like(k)
    hi = jnp.max(loss_rank, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        c = count_gt(mid)
        gt = c > k  # too many above mid -> raise the floor
        lo = jnp.where(gt, mid, lo)
        hi = jnp.where(gt, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    t = hi
    c = count_gt(t)
    s_above = jnp.sum(
        jnp.where(loss_rank > t, loss_rank, 0.0), axis=-1, keepdims=True
    )
    return jnp.sum(s_above + (k - c) * t)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 29126
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    rng = np.random.default_rng(0)
    # Realistic ranking loss: non-negative, zeros at "positives".
    v = np.abs(rng.normal(0, 2, (batch, p))).astype(np.float32)
    v[rng.random((batch, p)) < 0.005] = 0.0
    num_pos = rng.integers(20, 400, (batch, 1))
    num_neg = np.clip(7 * num_pos, None, p - 1).astype(np.int32)

    vj = jnp.asarray(v)
    nj = jnp.asarray(num_neg)

    fns = {
        "argsort2": mined_argsort2,
        "value_sort": mined_value_sort,
        "bisect": mined_bisect,
    }
    vals = {}
    for name, fn in fns.items():
        vals[name] = float(jax.jit(fn)(vj, nj))
    ref = vals["argsort2"]
    for name, val in vals.items():
        rel = abs(val - ref) / max(abs(ref), 1e-9)
        print(json.dumps({"impl": name, "value": val, "rel_err": rel}),
              flush=True)
        assert rel < 1e-6, (name, val, ref)

    for name, fn in fns.items():
        @jax.jit
        def chained(v, n, it, fn=fn):
            def body(_, carry):
                vc, acc = carry
                acc = acc + fn(vc, n)
                vc = vc + (acc * 0).astype(vc.dtype)
                return vc, acc

            return jax.lax.fori_loop(0, it, body, (v, jnp.float32(0)))[1]

        float(np.asarray(chained(vj, nj, 1)))
        t0 = time.perf_counter()
        float(np.asarray(chained(vj, nj, iters)))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"impl": name, "ms": round(dt * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
