"""Host-side visualization helpers (PIL/numpy).

Parity with /root/reference/utils/vis_utils.py (image grids, downsampling)
plus a torchless make_grid equivalent for the DTU result sheets
(reference training/inference_dtu.py:525-531 uses torchvision.make_grid).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
from PIL import Image


def get_image_grid(images: Sequence[Image.Image],
                   cols: int = None) -> Image.Image:
    """Tile PIL images into a grid (row-major)."""
    n = len(images)
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    w = max(im.width for im in images)
    h = max(im.height for im in images)
    grid = Image.new("RGB", (cols * w, rows * h), (0, 0, 0))
    for i, im in enumerate(images):
        grid.paste(im, ((i % cols) * w, (i // cols) * h))
    return grid


def downsample_image(img: Image.Image, factor: float) -> Image.Image:
    return img.resize((max(1, int(img.width * factor)),
                       max(1, int(img.height * factor))),
                      Image.Resampling.BILINEAR)


def make_grid_np(imgs: np.ndarray, nrow: int, padding: int = 2,
                 pad_value: float = 0.0) -> np.ndarray:
    """torchvision.utils.make_grid parity for NHWC float arrays in [0,1].

    imgs: (N, H, W, C) -> (H_grid, W_grid, C) with `nrow` images per row.
    """
    n, h, w, c = imgs.shape
    ncol = int(np.ceil(n / nrow))
    H = ncol * (h + padding) + padding
    W = nrow * (w + padding) + padding
    grid = np.full((H, W, c), pad_value, imgs.dtype)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = imgs[i]
    return grid


def to_pil(arr: np.ndarray) -> Image.Image:
    """float [0,1] or uint8 HWC -> PIL."""
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).round().astype(np.uint8)
    return Image.fromarray(arr)
