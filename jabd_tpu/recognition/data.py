"""Recognition data utilities: augmentation + dataset readers.

Reference: data.py (`CustomImageFolderDataset.augment` :217-260,
`low_res_augmentation` :322-333, `FiveValidationDataset` :263),
evaluate_utils.py:11-57 (bcolz/memmap validation-set loaders) and
convert.py (mxnet .rec / .bin conversion).

TPU-era replacements: the mxnet/bcolz C readers become plain numpy
memmaps; insightface-style `.bin` verification sets load with
pickle + cv2 (no mxnet needed).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

# cv2 interpolation ids in the reference's draw order (data.py:323-325).
# Constants inlined so the param draw needs no cv2 import.
CV2_INTERPS = (0, 1, 3, 2, 4)  # NEAREST, LINEAR, AREA, CUBIC, LANCZOS4


class FaceAugmentDraw(NamedTuple):
    """One drawn face augmentation (crop -> low-res -> photometric).

    crop:   (i, ch, j, cw) zeroed-border rect kept in place, or None
    lowres: (small_side, interp_down, interp_up) cv2 ids, or None
    photo:  (brightness, contrast, saturation) in [0.5, 1.5], or None
    photo_order: the ColorJitter op order (permutation of 0=brightness,
            1=contrast, 2=saturation — torchvision randomly permutes,
            reference data.py:248-258 applies in fn_idx order)
    score:  crop_ratio * resize_ratio (AdaFace's quality proxy)
    """

    crop: Optional[Tuple[int, int, int, int]]
    lowres: Optional[Tuple[int, int, int]]
    photo: Optional[Tuple[float, float, float]]
    photo_order: Tuple[int, int, int]
    score: float


def draw_face_augment_params(
    rng: np.random.Generator,
    h: int,
    w: int,
    crop_prob: float = 0.2,
    low_res_prob: float = 0.2,
    photometric_prob: float = 0.2,
) -> FaceAugmentDraw:
    """Consume the rng exactly as `augment_face` does and return the
    drawn parameters. Shared by the host pixel path and the device-plan
    builder (recognition/device_augment.py) so both produce identical
    augmentations from the same rng."""
    crop = None
    crop_ratio = 1.0
    if rng.random() < crop_prob:
        # RandomResizedCrop params: scale (0.2, 1.0), ratio (3/4, 4/3).
        area = h * w
        for _ in range(10):
            target_area = area * rng.uniform(0.2, 1.0)
            aspect = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                i = int(rng.integers(0, h - ch + 1))
                j = int(rng.integers(0, w - cw + 1))
                crop = (i, ch, j, cw)
                crop_ratio = min(ch, cw) / max(h, w)
                break
    lowres = None
    resize_ratio = 1.0
    if rng.random() < low_res_prob:
        side_ratio = rng.uniform(0.2, 1.0)
        small_side = int(side_ratio * h)
        down = CV2_INTERPS[rng.integers(len(CV2_INTERPS))]
        up = CV2_INTERPS[rng.integers(len(CV2_INTERPS))]
        lowres = (small_side, int(down), int(up))
        resize_ratio = side_ratio
    photo = None
    photo_order = (0, 1, 2)
    if rng.random() < photometric_prob:
        # ColorJitter.get_params order: the op permutation first, then
        # the factors (torchvision draws randperm(4) incl. the unused
        # hue slot; restricted to b/c/s it is a uniform 3-permutation).
        photo_order = tuple(int(i) for i in rng.permutation(3))
        # brightness/contrast/saturation jitter in [0.5, 1.5] (ColorJitter).
        photo = (
            float(rng.uniform(0.5, 1.5)),
            float(rng.uniform(0.5, 1.5)),
            float(rng.uniform(0.5, 1.5)),
        )
    return FaceAugmentDraw(
        crop, lowres, photo, photo_order, resize_ratio * crop_ratio
    )


def low_res_augmentation(img: np.ndarray, rng: np.random.Generator):
    """Down-up-sample with random interpolation pairs (data.py:322-333)."""
    import cv2

    side_ratio = rng.uniform(0.2, 1.0)
    small_side = int(side_ratio * img.shape[0])
    small = cv2.resize(
        img,
        (small_side, small_side),
        interpolation=CV2_INTERPS[rng.integers(len(CV2_INTERPS))],
    )
    aug = cv2.resize(
        small,
        (img.shape[1], img.shape[0]),
        interpolation=CV2_INTERPS[rng.integers(len(CV2_INTERPS))],
    )
    return aug, side_ratio


def apply_face_augment(
    img: np.ndarray, draw: FaceAugmentDraw
) -> np.ndarray:
    """Apply a drawn augmentation with the reference's host ops
    (cv2 uint8 resizes; PIL-exact ColorJitter via color_jitter_pil)."""
    import cv2

    if draw.crop is not None:
        i, ch, j, cw = draw.crop
        new = np.zeros_like(img)
        new[i : i + ch, j : j + cw] = img[i : i + ch, j : j + cw]
        img = new
    if draw.lowres is not None:
        small_side, down, up = draw.lowres
        small = cv2.resize(
            img, (small_side, small_side), interpolation=down
        )
        img = cv2.resize(
            small, (img.shape[1], img.shape[0]), interpolation=up
        )
    if draw.photo is not None:
        img = color_jitter_pil(
            img.astype(np.uint8), draw.photo, draw.photo_order
        )
    return img.astype(np.uint8)


def _pil_gray(img_u8: np.ndarray) -> np.ndarray:
    """PIL Image.convert("L"), byte-exact: the ITU-R 601 luma with
    PIL's fixed-point rounding ((r*19595 + g*38470 + b*7471 + 0x8000)
    >> 16; the three weights sum to exactly 65536)."""
    r = img_u8[..., 0].astype(np.uint32)
    g = img_u8[..., 1].astype(np.uint32)
    b = img_u8[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )


def _pil_blend(degenerate: np.ndarray, img: np.ndarray, factor: float):
    """PIL ImageEnhance blend, byte-exact: float interpolation toward
    the degenerate image, TRUNCATED to uint8 (the C cast — verified
    against ImageEnhance for factors on both sides of 1)."""
    out = degenerate.astype(np.float64) + factor * (
        img.astype(np.float64) - degenerate.astype(np.float64)
    )
    return np.clip(np.trunc(out), 0, 255).astype(np.uint8)


def color_jitter_pil(
    img_u8: np.ndarray,
    factors: Tuple[float, float, float],
    order: Tuple[int, int, int] = (0, 1, 2),
) -> np.ndarray:
    """torchvision ColorJitter(brightness, contrast, saturation) applied
    in `order`, byte-exact to the PIL path the reference takes
    (data.py:248-258 loops F.adjust_* over ColorJitter.get_params'
    fn_idx): brightness = blend toward black; contrast = blend toward
    the solid gray of the L-image's rounded mean; saturation = blend
    toward the per-pixel L image — each op materializing uint8, luma
    weights 0.299/0.587/0.114 (RGB input), NOT an unweighted channel
    mean. Oracle-pinned in tests/test_recognition.py against
    PIL.ImageEnhance itself."""
    b, c, s = factors
    for op in order:
        if op == 0:
            img_u8 = _pil_blend(np.zeros_like(img_u8), img_u8, b)
        elif op == 1:
            mean = int(_pil_gray(img_u8).mean() + 0.5)
            img_u8 = _pil_blend(np.full_like(img_u8, mean), img_u8, c)
        else:
            gray3 = np.repeat(_pil_gray(img_u8)[..., None], 3, axis=2)
            img_u8 = _pil_blend(gray3, img_u8, s)
    return img_u8


def augment_face(
    img: np.ndarray,
    rng: np.random.Generator,
    crop_prob: float = 0.2,
    low_res_prob: float = 0.2,
    photometric_prob: float = 0.2,
) -> Tuple[np.ndarray, float]:
    """AdaFace training augmentation (data.py:217-260): zero-padded random
    resized crop, low-res resampling, photometric jitter. Returns
    (augmented uint8 image, information score = crop_ratio*resize_ratio,
    the quality proxy AdaFace uses)."""
    h, w = img.shape[:2]
    draw = draw_face_augment_params(
        rng, h, w, crop_prob, low_res_prob, photometric_prob
    )
    return apply_face_augment(img, draw), draw.score


def normalize_face(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 in [-1, 1] (the 0.5/0.5 transform)."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


def load_bin_dataset(path: str, image_size: int = 112):
    """Load an insightface verification .bin (pairs + issame) without
    mxnet: the file is a pickled (bins, issame_list) where each bin is an
    encoded jpg (convert.py:50-71 semantics)."""
    import cv2

    with open(path, "rb") as f:
        bins, issame_list = pickle.load(f, encoding="bytes")
    n = len(bins)
    data = np.zeros((n, image_size, image_size, 3), np.uint8)
    for i, b in enumerate(bins):
        arr = np.frombuffer(
            b if isinstance(b, (bytes, bytearray)) else b.tobytes(),
            dtype=np.uint8,
        )
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)  # BGR
        if img.shape[0] != image_size:
            img = cv2.resize(img, (image_size, image_size))
        data[i] = img[:, :, ::-1]  # RGB
    return data, np.asarray(issame_list, bool)


def get_val_pair_memfile(
    data_dir: str, name: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Memmap validation loader (evaluate_utils.py:28-57): expects
    `{name}/memfile/{name}.npy`-style dumps + `{name}_list.npy` issame."""
    mem_path = os.path.join(data_dir, name, "memfile", f"{name}.npy")
    issame_path = os.path.join(data_dir, f"{name}_list.npy")
    carray = np.load(mem_path, mmap_mode="r")
    issame = np.load(issame_path)
    return carray, issame


class ImageFolderDataset:
    """Class-per-directory training dataset with the AdaFace augmentation
    (the reference's CustomImageFolderDataset, data.py:166-260).

    root/<class_name>/<image> ...; labels are contiguous ints in sorted
    class-name order (torchvision ImageFolder convention). `swap_color`
    replicates the WebFace BGR swap (data.py:205-207)."""

    def __init__(
        self,
        root: str,
        swap_color_channel: bool = False,
        crop_prob: float = 0.2,
        low_res_prob: float = 0.2,
        photometric_prob: float = 0.2,
        output_size: int = 112,
    ):
        self.root = root
        self.swap_color_channel = swap_color_channel
        self.crop_prob = crop_prob
        self.low_res_prob = low_res_prob
        self.photometric_prob = photometric_prob
        self.output_size = output_size
        classes = sorted(
            d
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        for c in classes:
            d = os.path.join(root, c)
            for f in sorted(os.listdir(d)):
                if f.lower().endswith(exts):
                    self.samples.append(
                        (os.path.join(d, f), self.class_to_idx[c])
                    )

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def num_classes(self) -> int:
        return len(self.class_to_idx)

    def get(self, index: int, rng: np.random.Generator):
        import cv2
        from PIL import Image

        path, label = self.samples[index]
        img = np.asarray(Image.open(path).convert("RGB"))
        if self.swap_color_channel:
            img = img[:, :, ::-1]
        if img.shape[:2] != (self.output_size, self.output_size):
            img = cv2.resize(img, (self.output_size, self.output_size))
        img, _score = augment_face(
            img,
            rng,
            crop_prob=self.crop_prob,
            low_res_prob=self.low_res_prob,
            photometric_prob=self.photometric_prob,
        )
        if rng.random() < 0.5:  # RandomHorizontalFlip in the transform
            img = img[:, ::-1]
        return normalize_face(img), label


def recognition_train_loader(
    dataset: ImageFolderDataset,
    batch_size: int,
    seed: int = 0,
    num_workers: int = 8,
    drop_last: bool = True,
):
    """Shuffled epoch of (images [B,H,W,3] float32, labels [B] int32)."""
    import concurrent.futures as cf

    order = np.random.default_rng(seed).permutation(len(dataset))
    pool = cf.ThreadPoolExecutor(max_workers=num_workers)
    try:
        def fetch(idx):
            rng = np.random.default_rng(
                (seed * 1_000_003 + int(idx) * 7919) & 0x7FFFFFFF
            )
            return dataset.get(int(idx), rng)

        cursor = 0
        while cursor + batch_size <= len(order) or (
            not drop_last and cursor < len(order)
        ):
            idxs = order[cursor : cursor + batch_size]
            cursor += batch_size
            results = list(pool.map(fetch, idxs))
            images = np.stack([r[0] for r in results]).astype(np.float32)
            labels = np.asarray([r[1] for r in results], np.int32)
            yield images, labels
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


VAL_SET_NAMES = ("agedb_30", "cfp_fp", "lfw", "cplfw", "calfw")


def load_five_validation_sets(data_dir: str) -> Dict[str, tuple]:
    """The 5-set validation bundle of train_val.py:106-136 / data.py:263.
    Sets not present on disk are skipped (partial bundles are common)."""
    out = {}
    for name in VAL_SET_NAMES:
        bin_path = os.path.join(data_dir, f"{name}.bin")
        mem_path = os.path.join(data_dir, name, "memfile", f"{name}.npy")
        if os.path.exists(bin_path):
            out[name] = load_bin_dataset(bin_path)
        elif os.path.exists(mem_path):
            out[name] = get_val_pair_memfile(data_dir, name)
    return out
