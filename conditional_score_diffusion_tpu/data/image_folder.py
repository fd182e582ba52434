"""Image-folder datasets: flat dirs of images, Haar-decomposed folders.

Reference: `lightning_data_modules/ImageDatasets.py:14-76` (celebA center
crop 108 + bicubic resize + optional ±0.5 normalize) and
`lightning_data_modules/HaarDecomposedDataset.py:11-68` (precomputed
per-level Haar approx coefficients: png at level 0, npy at level >= 1).

Fixes vs the reference (SURVEY.md §7.5): the train/val/test split is seeded
from ``config.seed`` (the reference's `random_split` is unseeded).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np
from PIL import Image

from . import register_datamodule
from .degradations import bicubic_resize_np


def _split_indices(n: int, split, seed: int):
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_train = int(split[0] * n)
    n_val = int(split[1] * n)
    return (
        order[:n_train],
        order[n_train : n_train + n_val],
        order[n_train + n_val :],
    )


class _FileBatcher:
    """Shared file-list batching with per-phase index subsets."""

    def __init__(self, config):
        self.config = config
        self.seed = config.seed

    def _iterate(self, indices, batch_size, shuffle, loop, load_one):
        rng = np.random.default_rng(self.seed)
        while True:
            order = rng.permutation(indices) if shuffle else indices
            for i in range(0, len(order) - batch_size + 1, batch_size):
                yield np.stack([load_one(j) for j in order[i : i + batch_size]])
            if not loop:
                return


@register_datamodule(name="image")
class ImageDataModule(_FileBatcher):
    """Flat image dir -> NHWC float batches."""

    def setup(self):
        c = self.config.data
        path = os.path.join(c.base_dir, c.dataset)
        self.files: List[str] = sorted(
            os.path.join(path, f) for f in os.listdir(path)
        )
        self.train_idx, self.val_idx, self.test_idx = _split_indices(
            len(self.files), c.split, self.config.seed
        )

    def _load(self, i: int) -> np.ndarray:
        c = self.config.data
        img = np.asarray(Image.open(self.files[i]).convert("RGB"), dtype=np.float32) / 255.0
        res = c.shape[1]
        if c.get("crop", False):
            # celebA 218x178 -> center 108 crop (reference `ImageDatasets.py:19-23`)
            crop = 108
            oh = (218 - crop) // 2
            ow = (178 - crop) // 2
            img = img[oh : oh + crop, ow : ow + crop]
            img = bicubic_resize_np(img[None], res)[0]
            img = (img - 0.5) / 0.5  # Normalize(0.5, 0.5)
        elif img.shape[0] != res:
            img = bicubic_resize_np(img[None], res)[0]
        return img

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        return self._iterate(self.train_idx, bs, True, True, self._load)

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.val_idx, bs, False, False, self._load)

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.test_idx, bs, False, False, self._load)


@register_datamodule(name="haar_multiscale")
class HaarDecomposedDataModule(_FileBatcher):
    """Precomputed per-level Haar approx coefficients."""

    def _files(self, phase: str) -> List[str]:
        c = self.config.data
        ext = "png" if c.level == 0 else "npy"
        root = os.path.join(c.base_dir, f"{c.dataset}_{c.image_size}", phase)
        return sorted(glob.glob(os.path.join(root, f"*.{ext}")))

    def setup(self):
        self.phase_files = {p: self._files(p) for p in ("train", "val", "test")}

    def _load_fn(self, phase):
        level = self.config.data.level
        files = self.phase_files[phase]

        def load(i: int) -> np.ndarray:
            if level == 0:
                return np.asarray(Image.open(files[i]), dtype=np.float32) / 255.0
            arr = np.load(files[i]).astype(np.float32)
            if arr.ndim == 3 and arr.shape[0] in (3, 12):  # stored CHW -> NHWC
                arr = arr.transpose(1, 2, 0)
            return arr

        return load

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        n = len(self.phase_files["train"])
        return self._iterate(np.arange(n), bs, True, True, self._load_fn("train"))

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        n = len(self.phase_files["val"])
        return self._iterate(np.arange(n), bs, False, False, self._load_fn("val"))

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        n = len(self.phase_files["test"])
        return self._iterate(np.arange(n), bs, False, False, self._load_fn("test"))
