"""Host-side image augmentations (PIL/numpy).

Reimplements the torchvision transforms used by the reference's augmentation
presets 1-8 (reference training/dataset.py:238-316): ColorJitter,
RandomGrayscale, GaussianBlur, RandomRotation(fill=1), RandomResizedCrop.
All randomness comes from an explicit numpy Generator so the pipeline is
reproducible and safe under parallel data workers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps


def color_jitter(img: Image.Image, rng: np.random.Generator,
                 brightness: float, contrast: float, saturation: float,
                 hue: float) -> Image.Image:
    """torchvision ColorJitter parity: each factor ~ U[max(0,1-v), 1+v],
    hue shift ~ U[-h, h], applied in random order."""
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f))
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f))
    if hue > 0:
        shift = rng.uniform(-hue, hue)

        def hue_op(im, shift=shift):
            hsv = np.array(im.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(shift * 255)) % 256
            return Image.fromarray(hsv.astype(np.uint8),
                                   "HSV").convert("RGB")
        ops.append(hue_op)
    order = rng.permutation(len(ops))
    for i in order:
        img = ops[i](img)
    return img


def random_grayscale(img: Image.Image, rng: np.random.Generator,
                     p: float) -> Image.Image:
    if rng.uniform() < p:
        return ImageOps.grayscale(img).convert("RGB")
    return img


def gaussian_blur(img: Image.Image, rng: np.random.Generator,
                  sigma_range: Tuple[float, float]) -> Image.Image:
    sigma = rng.uniform(*sigma_range)
    return img.filter(ImageFilter.GaussianBlur(radius=sigma))


def random_rotation(img: Image.Image, rng: np.random.Generator,
                    degrees: float, fill: int = 1) -> Image.Image:
    angle = rng.uniform(-degrees, degrees)
    return img.rotate(angle, resample=Image.Resampling.BILINEAR,
                      fillcolor=(fill, fill, fill))


def random_resized_crop(img: Image.Image, rng: np.random.Generator,
                        size: Tuple[int, int],
                        scale: Tuple[float, float],
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3)
                        ) -> Image.Image:
    """torchvision RandomResizedCrop parity (size is (h, w))."""
    W, H = img.size
    area = H * W
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = np.log(ratio)
        aspect = np.exp(rng.uniform(*log_ratio))
        w = int(round(np.sqrt(target_area * aspect)))
        h = int(round(np.sqrt(target_area / aspect)))
        if 0 < w <= W and 0 < h <= H:
            i = rng.integers(0, H - h + 1)
            j = rng.integers(0, W - w + 1)
            return _crop_resize(img, (j, i, j + w, i + h), size)
    # fallback: center crop
    scale_f = min(W / size[1], H / size[0])
    w, h = int(size[1] * scale_f), int(size[0] * scale_f)
    j, i = (W - w) // 2, (H - h) // 2
    return _crop_resize(img, (j, i, j + w, i + h), size)


def _crop_resize(img: Image.Image, box, size: Tuple[int, int]
                 ) -> Image.Image:
    """Integer-box crop + bilinear resize; routes through the native C++
    resize when built (the augmented-config hot path on the 1-core host)."""
    from view_neti_tpu.data import native
    if native.available():
        j0, i0, j1, i1 = box
        arr = np.asarray(img.convert("RGB"))[i0:i1, j0:j1]
        return Image.fromarray(
            native.resize(arr, size[0], size[1], mode="bilinear"))
    return img.resize((size[1], size[0]), Image.Resampling.BILINEAR,
                      box=box)


@dataclass
class _Step:
    p: float
    fn: object


# SINGLE SOURCE OF TRUTH for presets 1-8 (reference training/
# dataset.py:238-316), consumed by build_augmentations (host/PIL) AND
# ops/device_augment.from_augmentation_key (on-device). Op order is fixed
# for every preset: jitter, grayscale, blur, rotation, crop. Common
# parameters: jitter p=0.75 strength 0.04x4, blur sigma (0.1, 0.2),
# rotation +-10 deg fill=1, crop p=1 ratio (3/4, 4/3).
AUGMENTATION_PRESETS = {
    1: dict(gray_p=0.1, blur_p=0.10, rot_p=0.75, crop_scale=(0.850, 1.15)),
    2: dict(gray_p=0.1, blur_p=0.10),
    3: dict(gray_p=0.1, blur_p=0.10, rot_p=0.75),
    4: dict(gray_p=0.1, blur_p=0.10, crop_scale=(0.850, 1.15)),
    5: dict(blur_p=0.25, crop_scale=(0.950, 1.05)),
    6: dict(gray_p=0.1, blur_p=0.10, rot_p=0.75, crop_scale=(0.70, 1.3)),
    7: dict(blur_p=0.2, rot_p=0.75, crop_scale=(0.70, 1.3)),
    8: dict(gray_p=0.1, blur_p=0.10),
}


def build_augmentations(augmentation_key: int, size: Tuple[int, int]
                        ) -> List[_Step]:
    """Host/PIL pipeline for AUGMENTATION_PRESETS. `size` is (h, w) for
    the RandomResizedCrop."""
    if augmentation_key not in AUGMENTATION_PRESETS:
        raise ValueError(f"unknown augmentation_key {augmentation_key}")
    p = AUGMENTATION_PRESETS[augmentation_key]
    steps = [(0.75, lambda rng, im: color_jitter(
        im, rng, 0.04, 0.04, 0.04, 0.04))]
    if p.get("gray_p"):
        steps.append((p["gray_p"],
                      lambda rng, im: ImageOps.grayscale(im).convert("RGB")))
    steps.append((p["blur_p"],
                  lambda rng, im: gaussian_blur(im, rng, (0.1, 0.2))))
    if p.get("rot_p"):
        steps.append((p["rot_p"],
                      lambda rng, im: random_rotation(im, rng, 10, fill=1)))
    if p.get("crop_scale"):
        scale = p["crop_scale"]
        steps.append((1.0, lambda rng, im: random_resized_crop(
            im, rng, size, scale)))
    return [_Step(prob, fn) for prob, fn in steps]


def apply_augmentations(img: Image.Image, steps: Sequence[_Step],
                        rng: np.random.Generator) -> Image.Image:
    for step in steps:
        if step.p >= 1.0 or rng.uniform() < step.p:
            img = step.fn(rng, img)
    return img
