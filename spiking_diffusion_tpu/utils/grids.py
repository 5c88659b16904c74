"""Image-grid PNG rendering — the reference's qualitative log format.

Parity: the per-epoch recon grids (ori/recon interleaved 8x8,
``main.py:183-197``) and sample grids (4x8, ``main.py:276-285``). Rendered
with PIL directly (no matplotlib figure machinery needed for raw grids).
"""

from __future__ import annotations

import os

import numpy as np


def _to_uint8(images: np.ndarray) -> np.ndarray:
    """(N, H, W, C) in [-0.5, 0.5] -> (N, H, W[, 3]) uint8 (``main.py:180``).

    Single-channel images drop the channel axis (grayscale PNG); RGB images
    (CIFAR10/CelebA paths) keep it.
    """
    x = np.asarray(images)
    if x.ndim == 4 and x.shape[-1] == 1:
        x = x[..., 0]
    return (np.clip(x + 0.5, 0.0, 1.0) * 255).astype(np.uint8)


def _tile(images: np.ndarray, rows: int, cols: int, pad: int = 2) -> np.ndarray:
    n, h, w = images.shape[:3]
    extra = images.shape[3:]  # () grayscale or (3,) RGB
    grid = np.full(
        (rows * (h + pad) - pad, cols * (w + pad) - pad) + extra, 255, np.uint8
    )
    for i in range(min(n, rows * cols)):
        r, c = divmod(i, cols)
        grid[r * (h + pad) : r * (h + pad) + h,
             c * (w + pad) : c * (w + pad) + w] = images[i]
    return grid


def save_image_grid(
    images: np.ndarray,
    path: str,
    rows: int = 4,
    cols: int = 8,
    already_uint8: bool = False,
) -> str:
    """Save (N, H, W, C) images (normalized to [-0.5, 0.5]) as a grid PNG."""
    from PIL import Image

    arr = np.asarray(images) if already_uint8 else _to_uint8(images)
    if arr.ndim == 4 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    grid = _tile(arr, rows, cols)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
    return path


def save_recon_grid(
    originals: np.ndarray, recons: np.ndarray, path: str, cols: int = 8
) -> str:
    """Interleave original/reconstruction rows (``main.py:186-195``).

    Both inputs are normalized images in [-0.5, 0.5].
    """
    from PIL import Image

    ori = _to_uint8(originals)
    rec = _to_uint8(recons)
    n = min(len(ori), len(rec))
    rows = []
    for start in range(0, n, cols):
        rows.append(_tile(ori[start : start + cols], 1, cols))
        rows.append(_tile(rec[start : start + cols], 1, cols))
    pad = 2
    h = sum(r.shape[0] for r in rows) + pad * (len(rows) - 1)
    w = max(r.shape[1] for r in rows)
    canvas = np.full((h, w) + rows[0].shape[2:], 255, np.uint8)
    y = 0
    for r in rows:
        canvas[y : y + r.shape[0], : r.shape[1]] = r
        y += r.shape[0] + pad
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(canvas).save(path)
    return path
