"""Bicubic multi-scale super-resolution dataset (celebA jpgs).

Reference: `lightning_data_modules/SRDataset.py:14-92`
(``bicubic_multiscale``): per level L, crop to the GT resolution
(random crop for train / center crop for eval), then bicubic-resize to
hr = GT/2^L and lr = GT/2^(L+1); fixed celebA index split
162770/182637.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from PIL import Image

from . import register_datamodule
from .degradations import bicubic_resize_np


def celeba_split(paths, phase: str, rng: np.random.Generator):
    """Fixed celebA index split (reference `SRDataset.py:14-25`)."""
    if phase == "train":
        return paths[:162770]
    val = list(paths[162770:182637])
    rng.shuffle(val)
    return val[:5000]


@register_datamodule(name="bicubic_multiscale")
class SuperResolutionDataModule:
    def __init__(self, config):
        self.config = config
        self.seed = config.seed

    def setup(self):
        c = self.config.data
        all_paths = sorted(
            glob.glob(os.path.join(c.base_dir, c.dataset, "*.jpg"))
        )
        rng = np.random.default_rng(self.seed)
        self.phase_paths = {
            p: celeba_split(all_paths, p, rng) for p in ("train", "val", "test")
        }

    def _iterate(self, phase, batch_size, shuffle, loop):
        c = self.config.data
        level = int(c.level)
        gt = c.target_resolution
        hr_size = gt // 2**level
        lr_size = gt // 2 ** (level + 1)
        rng = np.random.default_rng(self.seed)
        paths = self.phase_paths[phase]
        n = len(paths)

        def crop(img):
            H, W, _ = img.shape
            if phase == "train":
                top = int(rng.integers(0, H - gt + 1)) if H > gt else 0
                left = int(rng.integers(0, W - gt + 1)) if W > gt else 0
            else:
                top, left = (H - gt) // 2, (W - gt) // 2
            return img[top : top + gt, left : left + gt]

        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for i in range(0, n - batch_size + 1, batch_size):
                imgs = []
                for j in order[i : i + batch_size]:
                    img = np.asarray(Image.open(paths[j]).convert("RGB"), np.float32) / 255.0
                    imgs.append(crop(img))
                gt_batch = np.stack(imgs)
                hr = bicubic_resize_np(gt_batch, hr_size)
                lr = bicubic_resize_np(gt_batch, lr_size)
                yield {"x": hr, "y": lr}
            if not loop:
                return

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        return self._iterate("train", bs, True, True)

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate("val", bs, False, False)

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate("test", bs, False, False)
