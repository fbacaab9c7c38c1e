"""Image datasets for the standalone DDNM restoration CLI.

Reference: models/DDNM/datasets/__init__.py (get_dataset,
center_crop_arr, Crop, data_transform/inverse_data_transform) plus the
celeba.py / lsun.py / imagenet_subset.py torchvision wrappers.

The reference's loaders assume torchvision + downloadable archives; here
every dataset is a *folder of images on disk* (the layout the reference
CLI ultimately consumes after download), loaded with PIL and preprocessed
with the reference's exact crop/resize semantics:

- ImageNet / generic:  center_crop_arr (openai/guided-diffusion BOX
  halving + BICUBIC scale + center crop), datasets/__init__.py:29-44.
- CelebA: the fixed (cx=89, cy=121) 128^2 face crop then resize,
  datasets/__init__.py:64-71.
- LSUN (+ out-of-dist folders): center_crop_arr, :116-140.

Batches come out NHWC float32 in [0,1]; `data_transform` /
`inverse_data_transform` implement the rescaled=True mapping to [-1,1]
(:208-236) used by the DDNM samplers.
"""
from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".ppm")

# CelebA face-crop box (reference datasets/__init__.py:64-69)
_CELEBA_CX, _CELEBA_CY = 89, 121


def center_crop_arr(img: Image.Image, image_size: int = 256) -> np.ndarray:
    """openai/guided-diffusion preprocessing (reference :29-44)."""
    while min(*img.size) >= 2 * image_size:
        img = img.resize(tuple(x // 2 for x in img.size),
                         resample=Image.BOX)
    scale = image_size / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size),
                     resample=Image.BICUBIC)
    arr = np.array(img)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy:cy + image_size, cx:cx + image_size]


def celeba_crop_arr(img: Image.Image, image_size: int = 256) -> np.ndarray:
    """Fixed 128^2 face crop then resize (reference :64-71)."""
    x1, x2 = _CELEBA_CY - 64, _CELEBA_CY + 64
    y1, y2 = _CELEBA_CX - 64, _CELEBA_CX + 64
    img = img.crop((y1, x1, y2, x2))
    img = img.resize((image_size, image_size), resample=Image.BICUBIC)
    return np.array(img)


def resize_arr(img: Image.Image, image_size: int = 256) -> np.ndarray:
    """Plain transforms.Resize to square (reference :49-50)."""
    img = img.resize((image_size, image_size), resample=Image.BILINEAR)
    return np.array(img)


_PREPROC = {
    "IMAGENET": center_crop_arr,
    "LSUN": center_crop_arr,
    "OOD": center_crop_arr,
    "CELEBA": celeba_crop_arr,
    "CIFAR10": resize_arr,
}


def list_images(root: str) -> List[str]:
    out = []
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTS):
                out.append(os.path.join(dirpath, f))
    return out


class ImageFolderDataset:
    """Folder-of-images dataset with reference preprocessing.

    `kind` picks the crop semantics; any unknown kind falls back to
    center_crop_arr (the guided-diffusion default).
    """

    def __init__(self, root: str, image_size: int = 256,
                 kind: str = "IMAGENET", limit: Optional[int] = None):
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"dataset root {root!r} does not exist; DDNM datasets are "
                "folders of images here (reference downloads them via "
                "torchvision, which this offline environment cannot)")
        self.files = list_images(root)
        if limit:
            self.files = self.files[:limit]
        if not self.files:
            raise FileNotFoundError(f"no images under {root!r}")
        self.image_size = image_size
        self.preproc = _PREPROC.get(kind.upper(), center_crop_arr)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> np.ndarray:
        img = Image.open(self.files[i]).convert("RGB")
        arr = self.preproc(img, self.image_size)
        return arr.astype(np.float32) / 255.0

    def batches(self, batch_size: int) -> Iterator[Tuple[List[str],
                                                         np.ndarray]]:
        """Yield (filenames, [B,H,W,3] float32 in [0,1]); last batch may
        be short."""
        for s in range(0, len(self), batch_size):
            idx = range(s, min(s + batch_size, len(self)))
            yield ([self.files[i] for i in idx],
                   np.stack([self[i] for i in idx]))


def get_dataset(name: str, root: str, image_size: int = 256,
                limit: Optional[int] = None) -> ImageFolderDataset:
    """Reference get_dataset (:47-201) folded to the offline folder
    layout; `name` in {IMAGENET, CELEBA, LSUN, OOD, CIFAR10, ...}."""
    return ImageFolderDataset(root, image_size, kind=name, limit=limit)


def data_transform(x: np.ndarray) -> np.ndarray:
    """[0,1] -> [-1,1] (rescaled=True, reference :208-223)."""
    return 2.0 * x - 1.0


def inverse_data_transform(x: np.ndarray) -> np.ndarray:
    """[-1,1] -> clipped [0,1] (reference :225-236)."""
    return np.clip((x + 1.0) / 2.0, 0.0, 1.0)
