"""End-to-end recognition training sanity: overfit synthetic identities.

The detection half has scripts/overfit_sanity.py; this is the
recognition twin — it validates that the complete AdaFace loop
(IR backbone train-mode BN + PReLU, margin head with norm-EMA stats,
SGD with the reference's BN/no-decay split, MultiStepLR) actually
LEARNS on real hardware, and that the learned embeddings separate
identities: after training, fresh (unseen-jitter) renders of each
identity must be nearest-neighbor identifiable and genuine/impostor
cosines must separate.

Reference analog: the missing-config Lightning recipe main.py +
train_val.py:61-75 (training_step = backbone -> head -> CE); there is
no upstream runnable equivalent, so this proof is the framework's own.

    python scripts/overfit_recognition.py           # TPU, ~3-8 min
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jabd_tpu.recognition import heads, net
from jabd_tpu.recognition import train as rtrain

IDS, BS, SIZE = 16, 64, 112


def identity_base(identity: int) -> np.ndarray:
    """Deterministic per-identity 'face': smooth low-frequency pattern
    (an 8x8 random grid upsampled), distinct per identity."""
    r = np.random.default_rng(1000 + identity)
    coarse = r.uniform(40, 215, (8, 8, 3)).astype(np.float32)
    return np.kron(coarse, np.ones((14, 14, 1), np.float32))  # 112x112


_BASES = None


def render(identity: int, rng: np.random.Generator) -> np.ndarray:
    """One 'photo' of an identity: base pattern + brightness/contrast
    jitter, small translation, pixel noise, random horizontal flip —
    enough nuisance variability that the head can't memorize pixels."""
    global _BASES
    if _BASES is None:
        _BASES = np.stack([identity_base(i) for i in range(IDS)])
    img = _BASES[identity].copy()
    img = img * rng.uniform(0.8, 1.2) + rng.uniform(-20, 20)
    dx, dy = rng.integers(-8, 9, size=2)
    img = np.roll(img, (dy, dx), axis=(0, 1))
    img += rng.normal(0, 8, img.shape)
    if rng.random() < 0.5:
        img = img[:, ::-1]
    return np.clip(img, 0, 255)


def make_batch(rng: np.random.Generator):
    labels = rng.integers(0, IDS, size=BS)
    imgs = np.stack([render(int(c), rng) for c in labels])
    return (imgs / 255.0 - 0.5) / 0.5, labels


def main(steps: int = 300, seed: int = 0):
    rng = np.random.default_rng(seed)
    model = net.build_model("ir_18", dtype=jnp.bfloat16)
    head = heads.build_head("adaface", class_num=IDS)
    state = rtrain.create_state(
        jax.random.PRNGKey(seed), model, head, num_train_steps_hint=steps,
        lr=0.05, milestones=(steps * 2 // 3, steps * 9 // 10),
    )
    step = rtrain.make_train_step(model, head)
    key = jax.random.PRNGKey(seed + 1)

    first_loss = None
    for it in range(steps):
        imgs, labels = make_batch(rng)
        key, sub = jax.random.split(key)
        state, m = step(
            state, jnp.asarray(imgs, jnp.float32), jnp.asarray(labels), sub
        )
        if it % 50 == 0 or it == steps - 1:
            loss, acc = float(m["loss"]), float(m["acc"])
            if first_loss is None:
                first_loss = loss
            print(f"step {it}: loss={loss:.3f} acc={acc:.3f}")

    # --- embedding separation on FRESH renders (unseen jitter draws) ---
    eval_rng = np.random.default_rng(seed + 777)
    per_id = 8
    imgs = np.stack(
        [render(i, eval_rng) for i in range(IDS) for _ in range(per_id)]
    )
    labels = np.repeat(np.arange(IDS), per_id)
    x = jnp.asarray((imgs / 255.0 - 0.5) / 0.5, jnp.float32)
    emb, _ = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": state.params["model"],
         "batch_stats": state.batch_stats["model"]},
        x,
    )
    emb = np.asarray(emb, np.float32)

    sims = emb @ emb.T
    same = labels[:, None] == labels[None, :]
    off = ~np.eye(len(emb), dtype=bool)
    genuine = sims[same & off]
    impostor = sims[~same]
    # 1-NN identification over the fresh set
    nn_idx = np.argmax(np.where(off, sims, -2.0), axis=1)
    nn_acc = float(np.mean(labels[nn_idx] == labels))
    print(
        f"fresh-render separation: genuine cos {genuine.mean():.3f} "
        f"(min {genuine.min():.3f}), impostor cos {impostor.mean():.3f} "
        f"(max {impostor.max():.3f}); 1-NN id acc {nn_acc:.3f}"
    )

    final_loss = float(m["loss"])
    ok = (
        final_loss < first_loss * 0.2
        and float(m["acc"]) > 0.95
        and nn_acc >= 0.95
        and genuine.mean() > impostor.mean() + 0.3
    )
    print(
        f"{'PASSED' if ok else 'FAILED'}: loss {first_loss:.2f} -> "
        f"{final_loss:.3f}, train acc {float(m['acc']):.3f}"
    )
    return ok


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    sys.exit(0 if main(n) else 1)
