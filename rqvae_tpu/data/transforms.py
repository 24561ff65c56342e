"""Image transforms: torch-free PIL/numpy pipelines producing NHWC float32
in [-1, 1] (channel-last for TPU).

Re-implements the reference torchvision pipelines with matching semantics:
 - img_datasets/transforms.py:17-66 (imagenet256x256, ffhq, LSUN)
 - txtimg_datasets/transforms.py:26-123 (dalle / dalle-vqvae / clip /
   clip-dvae, AugmentationDALLE off-center crop, Rescale)

Each transform is (PIL.Image, np.random.Generator) -> PIL.Image; pipelines
end with to_array (HWC float32 [0,1]) + normalize.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence

import numpy as np
from PIL import Image

BILINEAR = Image.BILINEAR


# ---- primitive ops (torchvision-equivalent) --------------------------------


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(int): shorter side -> size, keep aspect."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        return img.resize((size, max(1, round(size * h / w))), BILINEAR)
    return img.resize((max(1, round(size * w / h)), size), BILINEAR)


def resize_exact(img: Image.Image, size: tuple) -> Image.Image:
    return img.resize((size[1], size[0]), BILINEAR)  # PIL takes (w, h)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def random_crop(img: Image.Image, size: int, rng: np.random.Generator) -> Image.Image:
    w, h = img.size
    if w == size and h == size:
        return img
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img.crop((left, top, left + size, top + size))


def random_hflip(img: Image.Image, rng: np.random.Generator, p=0.5) -> Image.Image:
    if rng.random() < p:
        return img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


def random_resized_crop(
    img: Image.Image,
    size: int,
    rng: np.random.Generator,
    scale=(0.08, 1.0),
    ratio=(3 / 4, 4 / 3),
) -> Image.Image:
    """torchvision RandomResizedCrop: 10 area/ratio tries, center fallback."""
    w, h = img.size
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return img.crop((left, top, left + cw, top + ch)).resize(
                (size, size), BILINEAR
            )
    # fallback: center crop at clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    left, top = (w - cw) // 2, (h - ch) // 2
    return img.crop((left, top, left + cw, top + ch)).resize((size, size), BILINEAR)


def augmentation_dalle(img: Image.Image, size: int, rng: np.random.Generator) -> Image.Image:
    """Off-center square crop + random resize (reference
    txtimg_datasets/transforms.py:26-48)."""
    w, h = img.size
    s_min = min(w, h)
    off_h = int(rng.integers(3 * (h - s_min) // 8, max(3 * (h - s_min) // 8 + 1, 5 * (h - s_min) // 8)))
    off_w = int(rng.integers(3 * (w - s_min) // 8, max(3 * (w - s_min) // 8 + 1, 5 * (w - s_min) // 8)))
    img = img.crop((off_w, off_h, off_w + s_min, off_h + s_min))
    t_max = max(min(s_min, round(9 / 8 * size)), size)
    t = int(rng.integers(size, t_max + 1))
    return img.resize((t, t), BILINEAR)


def to_array(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr  # HWC [0, 1]


def normalize_pm1(arr: np.ndarray) -> np.ndarray:
    return arr * 2.0 - 1.0


def rescale_dalle(arr: np.ndarray) -> np.ndarray:
    """(1 - 2*0.1) * x + 0.1 (reference Rescale)."""
    return 0.8 * arr + 0.1


# ---- pipeline factory -------------------------------------------------------


class Transform:
    """A composed transform: (PIL.Image, rng) -> float32 HWC array."""

    def __init__(self, fn: Callable, out_size: int):
        self.fn = fn
        self.out_size = out_size

    def __call__(self, img: Image.Image, rng: Optional[np.random.Generator] = None):
        rng = rng if rng is not None else np.random.default_rng()
        return self.fn(img, rng)


def create_transforms(config, split: str = "train", is_eval: bool = False) -> Transform:
    """Mirror of reference img_datasets/transforms.py:17-66."""
    ttype = config["transforms"]["type"]
    train = split == "train" and not is_eval

    if ttype == "imagenet256x256":
        if train:
            def fn(img, rng):
                img = resize_shorter(img, 256)
                img = random_crop(img, 256, rng)
                img = random_hflip(img, rng)
                return normalize_pm1(to_array(img))
        else:
            def fn(img, rng):
                img = resize_shorter(img, 256)
                img = center_crop(img, 256)
                img = resize_exact(img, (256, 256))
                return normalize_pm1(to_array(img))
        return Transform(fn, 256)

    if "ffhq" in ttype:
        resolution = int(ttype.split("_")[0].split("x")[-1])
        if train:
            def fn(img, rng):
                img = random_resized_crop(
                    img, resolution, rng, scale=(0.75, 1.0), ratio=(1.0, 1.0)
                )
                img = random_hflip(img, rng)
                return normalize_pm1(to_array(img))
        else:
            def fn(img, rng):
                img = resize_shorter(img, resolution)
                img = center_crop(img, resolution)
                return normalize_pm1(to_array(img))
        return Transform(fn, resolution)

    if ttype in ("LSUN", "LSUN-cat", "LSUN-church", "LSUN-bedroom"):
        resolution = 256

        def fn(img, rng):
            img = resize_shorter(img, resolution)
            img = center_crop(img, resolution)
            return normalize_pm1(to_array(img))

        return Transform(fn, resolution)

    if ttype in ("none", None):
        return Transform(lambda img, rng: normalize_pm1(to_array(img)), -1)

    raise NotImplementedError(f"{ttype} not implemented..")


def create_txtimg_transforms(config, split: str = "train", is_eval: bool = False) -> Transform:
    """Mirror of reference txtimg_datasets/transforms.py:60-123."""
    ttype = config["transforms"]
    res = config["image_resolution"]
    train = split == "train" and not is_eval

    def build(aug_train, final):
        if train:
            def fn(img, rng):
                return final(to_array(aug_train(img, rng)))
        else:
            def fn(img, rng):
                return final(to_array(resize_exact(img, (res, res))))
        return Transform(fn, res)

    if ttype == "dalle":
        return build(
            lambda img, rng: random_crop(augmentation_dalle(img, res, rng), res, rng),
            rescale_dalle,
        )
    if ttype == "dalle-vqvae":
        return build(
            lambda img, rng: random_crop(augmentation_dalle(img, res, rng), res, rng),
            normalize_pm1,
        )
    if ttype == "clip":
        return build(
            lambda img, rng: random_resized_crop(
                resize_exact(img, (res, res)), res, rng, scale=(0.8, 1.0)
            ),
            normalize_pm1,
        )
    if ttype == "clip-dvae":
        return build(
            lambda img, rng: random_resized_crop(
                resize_exact(img, (res, res)), res, rng, scale=(0.8, 1.0)
            ),
            rescale_dalle,
        )
    if ttype in ("none", None):
        return Transform(lambda img, rng: normalize_pm1(to_array(img)), res)
    raise NotImplementedError(f"{ttype} not implemented..")
