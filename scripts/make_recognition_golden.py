"""Generate the committed golden fixture for the RECOGNITION half
(the detection twin is scripts/make_golden_fixture.py).

Pins the aligned-crop -> IR-18 embedding chain against committed
goldens so cross-round drift in the recognition forward path (PReLU /
BasicBlockIR / SE / the output BN-flatten-linear-BN stack), the
Umeyama alignment, and the embed preprocessing (BGR->RGB, 0.5/0.5
normalize — pipeline.py::embed_crops) trips an in-suite alarm instead
of surfacing as a silent eval shift.

Weights are NOT model.init draws: each leaf is filled from a
path-keyed deterministic stream (crc32 of the param path seeds a
Generator), so refactors that merely reorder init calls cannot
invalidate the golden — only changes to the parameter TREE or the
forward MATH can. Kernels are fan-in scaled, norms start at identity,
PReLU at 0.25: sane activation magnitudes without training.

Writes tests/fixtures/golden_recognition/:
  scene_{0,1}.png  - 240x320 lossless scenes, each containing one
                     warped (rotated+scaled) face-texture whose TRUE
                     5-point landmarks are known by construction
  golden.npz       - the landmark sets, the two aligned 112^2 crops,
                     the [2,512] embeddings, and their cosine

    python scripts/make_recognition_golden.py
"""

import os
import sys
import zlib

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "golden_recognition",
)
ARCH = "ir_18"


def deterministic_variables(arch=ARCH):
    """Path-keyed deterministic weights for the IR template (see module
    docstring for why this beats seeded model.init for a golden)."""
    from jabd_tpu.recognition.net import build_model

    model = build_model(arch)
    template = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 112, 112, 3), jnp.float32),
    )

    def fill(path, leaf):
        name = jax.tree_util.keystr(path)
        shape = tuple(leaf.shape)
        rng = np.random.default_rng(zlib.crc32(name.encode()))
        leafname = name.rsplit("'", 2)[-2] if "'" in name else name
        if "batch_stats" in name:
            v = np.zeros(shape) if leafname == "mean" else np.ones(shape)
        elif leafname in ("scale",):
            v = np.ones(shape)
        elif leafname in ("bias",):
            v = np.zeros(shape)
        elif leafname in ("alpha",):  # PReLU
            v = np.full(shape, 0.25)
        else:  # conv / dense kernels: fan-in-scaled normal
            fan_in = int(np.prod(shape[:-1])) or 1
            v = rng.standard_normal(shape) / np.sqrt(fan_in)
        return jnp.asarray(v, jnp.float32)

    return model, jax.tree_util.tree_map_with_path(fill, template)


def face_texture(identity: int) -> np.ndarray:
    """Deterministic 112^2 'face' (the overfit_recognition pattern:
    coarse grid upsampled) with high-contrast eye/mouth blobs at the
    ArcFace template points so alignment quality is visible."""
    from jabd_tpu.recognition.align import ARCFACE_TEMPLATE

    r = np.random.default_rng(500 + identity)
    coarse = r.uniform(40, 215, (8, 8, 3)).astype(np.float32)
    img = np.kron(coarse, np.ones((14, 14, 1), np.float32))
    for k, (x, y) in enumerate(ARCFACE_TEMPLATE):
        xi, yi = int(round(x)), int(round(y))
        c = 235.0 if k < 2 else 20.0  # bright eyes, dark nose/mouth
        img[max(yi - 3, 0) : yi + 4, max(xi - 3, 0) : xi + 4] = c
    return np.clip(img, 0, 255).astype(np.uint8)


def scenes():
    """Two 240x320 scenes, each with one warped face; returns
    {stem: (scene_u8_bgr, landmarks [5,2] float32)}."""
    import cv2

    from jabd_tpu.recognition.align import ARCFACE_TEMPLATE

    out = {}
    for i, (angle, scale, tx, ty) in enumerate(
        [(18.0, 1.25, 60.0, 40.0), (-27.0, 0.8, 150.0, 90.0)]
    ):
        rng = np.random.default_rng(40 + i)
        scene = rng.integers(20, 90, (240, 320, 3)).astype(np.uint8)
        a = np.deg2rad(angle)
        rot = np.array(
            [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float64
        )
        m = np.empty((2, 3), np.float64)
        m[:, :2] = scale * rot
        m[:, 2] = (tx, ty)
        warped = cv2.warpAffine(
            face_texture(i), m.astype(np.float32), (320, 240),
            flags=cv2.INTER_LINEAR,
        )
        mask = (
            cv2.warpAffine(
                np.full((112, 112), 255, np.uint8), m.astype(np.float32),
                (320, 240),
            )[..., None]
            > 127
        )
        scene = np.where(mask, warped, scene).astype(np.uint8)
        lmk = (ARCFACE_TEMPLATE @ m[:, :2].T + m[:, 2]).astype(np.float32)
        out[f"scene_{i}"] = (scene, lmk)
    return out


def embed(model, variables, crops_u8):
    """pipeline.embed_crops preprocessing + forward, eager (2 crops)."""
    x = crops_u8[..., ::-1].astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5
    emb, _ = model.apply(variables, jnp.asarray(x), train=False)
    return np.asarray(emb, np.float32)


def main():
    import cv2

    from jabd_tpu.recognition.align import align_face

    model, variables = deterministic_variables()
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    golden = {}
    crops = []
    for stem, (scene, lmk) in scenes().items():
        assert cv2.imwrite(os.path.join(FIXTURE_DIR, stem + ".png"), scene)
        crop = align_face(scene, lmk)
        golden[f"landmarks_{stem}"] = lmk
        golden[f"crop_{stem}"] = crop
        crops.append(crop)
    emb = embed(model, variables, np.stack(crops))
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    golden["embeddings"] = emb
    golden["cosine_01"] = np.float32(n[0] @ n[1])
    np.savez_compressed(os.path.join(FIXTURE_DIR, "golden.npz"), **golden)
    print(
        "emb norms:", np.linalg.norm(emb, axis=1),
        "cos01:", float(golden["cosine_01"]),
        flush=True,
    )
    print("golden recognition fixture written to", FIXTURE_DIR, flush=True)


if __name__ == "__main__":
    main()
