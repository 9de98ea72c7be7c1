"""WIDER FACE training data pipeline.

Reference: utils/dataloader.py — `DataGenerator.process_labels` (:151,
label.txt parsing), `__getitem__` (:21, [N,15] annotation rows),
`get_random_data` (:71, the augmentation recipe) and `detection_collate`
(:177, drops empty images).

TPU-first batching: targets are padded to a static [B, G_max, 15] tensor
with a validity mask (instead of the reference's ragged list of tensors),
so the whole train step — matching included — stays inside one jitted
device program. Augmentation runs on the host in numpy/PIL worker threads
exactly like the reference's CPU DataLoader workers.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from jabd_tpu.ops.image import preprocess_input_np


def parse_wider_labels(txt_path: str) -> Tuple[List[str], List[np.ndarray]]:
    """Parse the retinaface-style label.txt.

    Format (utils/dataloader.py:151-175): lines `# <relpath>` then per-face
    rows `x y w h lx0 ly0 v0 lx1 ly1 v1 ... lx4 ly4 v4 [conf]`.
    Returns (image_paths, list of [N, 15] float arrays) where columns are
    x1 y1 x2 y2, 5x(lx, ly), flag (1 with landmarks / -1 without)
    — the annotation layout of utils/dataloader.py:21-66.
    """
    imgs_path: List[str] = []
    raw: List[List[List[float]]] = []
    labels: List[List[float]] = []
    first = True
    img_dir = txt_path.replace("label.txt", "images/")
    with open(txt_path, "r") as f:
        for line in f:
            line = line.rstrip()
            if line.startswith("#"):
                if first:
                    first = False
                else:
                    raw.append(labels.copy())
                    labels.clear()
                imgs_path.append(img_dir + line[2:])
            elif line:
                labels.append([float(x) for x in line.split(" ")])
    raw.append(labels)

    annos: List[np.ndarray] = []
    for faces in raw:
        a = np.zeros((len(faces), 15), np.float32)
        for i, lb in enumerate(faces):
            a[i, 0] = lb[0]
            a[i, 1] = lb[1]
            a[i, 2] = lb[0] + lb[2]
            a[i, 3] = lb[1] + lb[3]
            # landmark columns skip the visibility flags
            # (utils/dataloader.py:45-54).
            for p in range(5):
                a[i, 4 + 2 * p] = lb[4 + 3 * p]
                a[i, 5 + 2 * p] = lb[5 + 3 * p]
            a[i, 14] = -1.0 if a[i, 4] < 0 else 1.0
        annos.append(a)
    return imgs_path, annos


@dataclasses.dataclass(frozen=True)
class AugmentDraw:
    """The random decisions of one `get_random_data` call
    (utils/dataloader.py:71-113), separated from the pixel work so the
    host (PIL/cv2) and device (MXU resample) pipelines share one source
    of truth for RNG consumption order and box geometry."""

    nw: int  # resized width before paste
    nh: int  # resized height
    dx: int  # paste offset x (can be negative)
    dy: int  # paste offset y
    flip: bool
    dh: float  # hue shift (fraction; applied as dh*360 in cv2 H degrees)
    ds: float  # saturation scale
    dv: float  # value scale


def draw_augment_params(
    rng: np.random.Generator,
    input_size: int,
    jitter: float = 0.3,
    hue: float = 0.1,
    sat: float = 1.5,
    val: float = 1.5,
) -> AugmentDraw:
    """Consume RNG draws in exactly the reference's order
    (utils/dataloader.py:78-113): aspect (2 draws), scale, dx, dy, flip,
    hue, sat (cond+value), val (cond+value)."""

    def rand(a=0.0, b=1.0):
        return rng.random() * (b - a) + a

    h = w = input_size
    new_ar = (w / h) * rand(1 - jitter, 1 + jitter) / rand(1 - jitter, 1 + jitter)
    scale = rand(0.25, 3.25)
    if new_ar < 1:
        nh = int(scale * h)
        nw = int(nh * new_ar)
    else:
        nw = int(scale * w)
        nh = int(nw / new_ar)
    # nw/nh stay raw (box math uses them); resize callers clamp to >= 1.
    # rand(0, w-nw) also when w-nw is negative (u*(w-nw), u~U[0,1)) —
    # byte-level parity of the paste offset depends on this form
    # (utils/dataloader.py:92-93).
    dx = int(rand(0, w - nw))
    dy = int(rand(0, h - nh))
    flip = rand() < 0.5
    dh = rand(-hue, hue)
    ds = rand(1, sat) if rand() < 0.5 else 1 / rand(1, sat)
    dv = rand(1, val) if rand() < 0.5 else 1 / rand(1, val)
    return AugmentDraw(nw, nh, dx, dy, flip, dh, ds, dv)


def transform_boxes(
    box: np.ndarray,
    draw: AugmentDraw,
    image_wh: Tuple[int, int],
    input_size: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Apply the draw's geometry to [N, 15] annotations — shuffle, map to
    canvas coords, flip remap, center filter, clip, >1px filter,
    zero flagged landmarks, normalize (utils/dataloader.py:115-147).

    RNG note: the one draw consumed here (`rng.shuffle`) happens AFTER all
    of `draw_augment_params`'s draws in the reference's order.
    """
    iw, ih = image_wh
    h = w = input_size
    nw, nh, dx, dy = draw.nw, draw.nh, draw.dx, draw.dy
    box = box.copy()
    xs = [0, 2, 4, 6, 8, 10, 12]
    ys = [1, 3, 5, 7, 9, 11, 13]
    if len(box) > 0:
        rng.shuffle(box)
        box[:, xs] = box[:, xs] * nw / iw + dx
        box[:, ys] = box[:, ys] * nh / ih + dy
        if draw.flip:
            box[:, xs] = w - box[:, [2, 0, 6, 4, 8, 12, 10]]
            box[:, [5, 7, 9, 11, 13]] = box[:, [7, 5, 9, 13, 11]]

        cx = (box[:, 0] + box[:, 2]) / 2
        cy = (box[:, 1] + box[:, 3]) / 2
        keep = (cx > 0) & (cy > 0) & (cx < w) & (cy < h)
        box = box[keep]

        box[:, 0:14][box[:, 0:14] < 0] = 0
        box[:, xs] = np.minimum(box[:, xs], w)
        box[:, ys] = np.minimum(box[:, ys], h)
        bw = box[:, 2] - box[:, 0]
        bh = box[:, 3] - box[:, 1]
        box = box[(bw > 1) & (bh > 1)]

    if len(box) > 0:
        box[:, 4:-1][box[:, -1] == -1] = 0
        box[:, xs] /= w
        box[:, ys] /= h
    return box.astype(np.float32)


def augment_sample(
    image,  # PIL.Image
    box: np.ndarray,  # [N, 15]
    input_size: int,
    rng: np.random.Generator,
    jitter: float = 0.3,
    hue: float = 0.1,
    sat: float = 1.5,
    val: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """The reference `get_random_data` recipe (utils/dataloader.py:71-149):
    random aspect jitter +-0.3, scale 0.25-3.25, BICUBIC resize, random
    paste on a 128-gray canvas, hflip 0.5 with landmark index remap, HSV
    jitter, box clip/filter > 1 px, normalize coords, zero landmarks where
    flag == -1. Returns (float32 HWC image [not mean-subtracted], [M, 15]
    normalized targets).

    Intentional deviation: the reference's upper-bound clip
    `box[:, cols][box[:, cols] > w] = w` (utils/dataloader.py:138-139)
    assigns into a fancy-indexed COPY and is therefore a silent no-op —
    its training boxes can exceed the canvas. We clip for real
    (np.minimum), which only changes boxes the reference left overflowing.
    """
    import cv2
    from PIL import Image

    iw, ih = image.size
    h = w = input_size
    draw = draw_augment_params(rng, input_size, jitter, hue, sat, val)

    image = image.resize(
        (max(draw.nw, 1), max(draw.nh, 1)), Image.BICUBIC
    )
    canvas = Image.new("RGB", (w, h), (128, 128, 128))
    canvas.paste(image, (draw.dx, draw.dy))
    image = canvas
    if draw.flip:
        image = image.transpose(Image.FLIP_LEFT_RIGHT)

    # HSV jitter in cv2's float HSV space (H in [0, 360]).
    x = cv2.cvtColor(np.array(image, np.float32) / 255.0, cv2.COLOR_RGB2HSV)
    x[..., 0] += draw.dh * 360
    x[..., 0][x[..., 0] > 1] -= 1  # reference quirk kept as-is (:112-113)
    x[..., 0][x[..., 0] < 0] += 1
    x[..., 1] *= draw.ds
    x[..., 2] *= draw.dv
    x[x[:, :, 0] > 360, 0] = 360
    x[:, :, 1:][x[:, :, 1:] > 1] = 1
    x[x < 0] = 0
    image_data = cv2.cvtColor(x, cv2.COLOR_HSV2RGB) * 255

    box = transform_boxes(box, draw, (iw, ih), input_size, rng)
    return image_data.astype(np.float32), box


class WiderFaceDataset:
    """Map-style dataset over a WIDER label.txt (training split)."""

    def __init__(self, txt_path: str, input_size: int, seed: int = 0):
        self.input_size = input_size
        self.imgs_path, self.annos = parse_wider_labels(txt_path)
        self.seed = seed

    def __len__(self) -> int:
        return len(self.imgs_path)

    def get(self, index: int, rng: np.random.Generator):
        from PIL import Image

        img = Image.open(self.imgs_path[index]).convert("RGB")
        anno = self.annos[index]
        img_data, target = augment_sample(img, anno, self.input_size, rng)
        return preprocess_input_np(img_data), target


def batch_targets(
    targets: Sequence[np.ndarray], max_targets: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad ragged [N_i, 15] targets to static arrays + mask.

    Returns (boxes [B, G, 4], labels [B, G], landms [B, G, 10],
    valid [B, G]). GTs beyond max_targets are dropped (WIDER images can
    have hundreds of faces; G=128 covers ~99.9% of training crops)."""
    b = len(targets)
    boxes = np.zeros((b, max_targets, 4), np.float32)
    labels = np.zeros((b, max_targets), np.float32)
    landms = np.zeros((b, max_targets, 10), np.float32)
    valid = np.zeros((b, max_targets), bool)
    for i, t in enumerate(targets):
        n = min(len(t), max_targets)
        if n:
            boxes[i, :n] = t[:n, :4]
            landms[i, :n] = t[:n, 4:14]
            labels[i, :n] = t[:n, 14]
            valid[i, :n] = True
    return boxes, labels, landms, valid


def sample_rng(seed: int, idx: int, attempt: int = 0) -> np.random.Generator:
    """The per-(sample, attempt) augmentation RNG stream. ONE formula
    shared by the host loader and the device-augment loader — their
    targets must stay byte-identical, so the stream may never fork."""
    return np.random.default_rng(
        (seed * 1_000_003 + int(idx) * 7919 + attempt) & 0x7FFFFFFF
    )


def epoch_batches(
    n: int, batch_size: int, seed: int, drop_last: bool = True
) -> Iterator[np.ndarray]:
    """Shuffled index batches for one epoch — the DataLoader
    shuffle+drop_last skeleton (train_mobilenetV3_ecagai.py:568-569),
    shared by both loaders."""
    order = np.random.default_rng(seed).permutation(n)
    cursor = 0
    while cursor + batch_size <= n or (not drop_last and cursor < n):
        yield order[cursor : cursor + batch_size]
        cursor += batch_size


def backfill_batch(idxs, results, refetch, is_empty, batch_size: int):
    """detection_collate's empty handling (utils/dataloader.py:177-186)
    + the static-shape completion both loaders need: re-draw samples
    that lost every box (bounded attempts via refetch(idx, attempt)),
    drop the still-empty, round-robin duplicate survivors up to the
    full batch. Returns [] when nothing survived."""
    out = []
    for idx, res in zip(idxs, results):
        attempt = 1
        while is_empty(res) and attempt < 8:
            res = refetch(idx, attempt)
            attempt += 1
        if not is_empty(res):
            out.append(res)
    if not out:
        return []
    n_live = len(out)
    while len(out) < batch_size:
        # Round-robin over the surviving samples.
        out.append(out[(len(out) - n_live) % n_live])
    return out


def train_loader(
    dataset: WiderFaceDataset,
    batch_size: int,
    max_targets: int = 128,
    seed: int = 0,
    num_workers: int = 8,
    drop_last: bool = True,
) -> Iterator[Tuple[np.ndarray, Tuple[np.ndarray, ...]]]:
    """One epoch of shuffled, host-augmented, padded batches.

    Mirrors DataLoader(shuffle, drop_last, collate_fn=detection_collate)
    (train_mobilenetV3_ecagai.py:568-569); images that lose all boxes to
    augmentation are dropped like detection_collate (:177-186) and
    backfilled to keep the batch full (static shape for jit)."""
    pool = cf.ThreadPoolExecutor(max_workers=num_workers)
    try:

        def fetch(idx, attempt=0):
            return dataset.get(int(idx), sample_rng(seed, idx, attempt))

        for idxs in epoch_batches(
            len(dataset), batch_size, seed, drop_last
        ):
            results = backfill_batch(
                idxs,
                list(pool.map(fetch, idxs)),
                fetch,
                lambda r: len(r[1]) == 0,
                batch_size,
            )
            if not results:
                continue
            images = np.stack([im for im, _ in results])
            tgts = batch_targets([t for _, t in results], max_targets)
            yield images, tgts
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
