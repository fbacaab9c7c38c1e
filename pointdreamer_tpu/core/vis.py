"""Debug visualization (headless matplotlib).

Role of the reference's VTK viewers and image-sheet helpers
(utils/vtk_basic.py vis_actors_vtk, utils/utils_2d.py cat_images /
display_CHW_RGB_img_np_matplotlib) — saved to files instead of interactive
windows (no display in TPU pods).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def cat_images(*imgs: np.ndarray, pad: int = 2) -> np.ndarray:
    """Horizontally concatenate HWC float images with white padding
    (reference utils_2d.py:94 cat_images)."""
    h = max(i.shape[0] for i in imgs)
    parts = []
    for img in imgs:
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        if img.shape[0] < h:
            img = np.pad(img, ((0, h - img.shape[0]), (0, 0), (0, 0)),
                         constant_values=1.0)
        parts.append(img)
        parts.append(np.ones((h, pad, 3), img.dtype))
    return np.concatenate(parts[:-1], axis=1)


def save_image_sheet(imgs: List[np.ndarray], path: str,
                     titles: Optional[List[str]] = None,
                     cols: int = 4) -> None:
    plt = _plt()
    n = len(imgs)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            img = np.asarray(imgs[i])
            if img.ndim == 2:
                ax.imshow(img, cmap="viridis")
            else:
                ax.imshow(np.clip(img, 0, 1))
            if titles and i < len(titles):
                ax.set_title(titles[i], fontsize=8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_pointcloud_views(xyz: np.ndarray, rgb: Optional[np.ndarray],
                          path: str, size: float = 1.0) -> None:
    """3-view scatter plot of a colored cloud (vtk_basic substitute)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    pairs = [(0, 1), (0, 2), (1, 2)]
    c = np.clip(rgb, 0, 1) if rgb is not None else None
    for ax, (a, b) in zip(axes, pairs):
        ax.scatter(xyz[:, a], xyz[:, b], s=size, c=c)
        ax.set_aspect("equal")
        ax.set_xlabel("xyz"[a])
        ax.set_ylabel("xyz"[b])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
