"""Paired A/B datasets: image pairs (edges2shoes) and MRI->PET volumes.

Reference: `lightning_data_modules/PairedDataset.py:21-319` — A/B paired
directories (`{base_dir}/{dataset}/{phase}/A|B`), jpg/png images or `.npy`
2D/3D scans with per-domain value-range normalization (``data.range_x`` /
``range_y``), and `lightning_data_modules/DUALGLOWDataset.py:35-103`
(MRI/PET paired volumes with flip augmentation).

Convention: domain A is the condition y, domain B the target x (the
reference returns ``(A, B) = (y, x)``).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from PIL import Image

from . import register_datamodule

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".tif", ".tiff", ".webp")


def normalise(x: np.ndarray, value_range=None) -> np.ndarray:
    """Map into [0, 1] by the given (min, max) range, or the array's own
    (reference `PairedDataset.py:12-19`)."""
    if value_range is None:
        lo, hi = float(x.min()), float(x.max())
    else:
        lo, hi = value_range
    return (x - lo) / (hi - lo)


def load_image_paths(root: str, phase: str):
    """A/B dirs under {root}/{phase} (reference `PairedDataset.py:261-296`)."""
    a_dir = os.path.join(root, phase, "A")
    b_dir = os.path.join(root, phase, "B")
    paths = {}
    for key, d in (("A", a_dir), ("B", b_dir)):
        files = sorted(
            f for f in glob.glob(os.path.join(d, "*"))
            if f.lower().endswith(IMG_EXTENSIONS + (".npy",))
        )
        paths[key] = files
    assert len(paths["A"]) == len(paths["B"]) and paths["A"], f"bad paired tree at {root}/{phase}"
    return paths


class _PairedBase:
    def __init__(self, config):
        self.config = config
        self.seed = config.seed

    def setup(self):
        root = os.path.join(self.config.data.base_dir, self.config.data.dataset)
        self.paths = {p: load_image_paths(root, p) for p in ("train", "val", "test")}
        ext = os.path.splitext(self.paths["train"]["A"][0])[1].lower()
        self.is_npy = ext == ".npy"

    def _load_pair(self, phase, i, rng):
        c = self.config.data
        a_path = self.paths[phase]["A"][i]
        b_path = self.paths[phase]["B"][i]
        if self.is_npy:
            A = np.load(a_path).astype(np.float32)
            B = np.load(b_path).astype(np.float32)
            A = normalise(A, c.get("range_y", None))
            B = normalise(B, c.get("range_x", None))
            if A.ndim == 2:  # 2D slices -> add channel
                A, B = A[..., None], B[..., None]
            elif A.ndim == 3 and len(c.shape_x) == 4:  # volume -> add channel
                A, B = A[..., None], B[..., None]
        else:
            A = np.asarray(Image.open(a_path).convert("RGB"), np.float32) / 255.0
            B = np.asarray(Image.open(b_path).convert("RGB"), np.float32) / 255.0
        return A, B

    def _iterate(self, phase, batch_size, shuffle, loop, augment):
        rng = np.random.default_rng(self.seed)
        n = len(self.paths[phase]["A"])
        flip = self.config.data.get("use_flip", False) and augment
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for i in range(0, n - batch_size + 1, batch_size):
                ys, xs = [], []
                for j in order[i : i + batch_size]:
                    A, B = self._load_pair(phase, int(j), rng)
                    if flip and rng.random() < 0.5:
                        A = np.ascontiguousarray(np.flip(A, axis=-2))
                        B = np.ascontiguousarray(np.flip(B, axis=-2))
                    ys.append(A)
                    xs.append(B)
                yield {"x": np.stack(xs), "y": np.stack(ys)}
            if not loop:
                return

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        return self._iterate("train", bs, True, True, True)

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate("val", bs, False, False, False)

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate("test", bs, False, False, False)


@register_datamodule(name="paired")
class PairedDataModule(_PairedBase):
    """Reference `PairedDataset.py:105-131`."""


@register_datamodule(name="DUAL-GLOW")
class DualGlowDataModule(_PairedBase):
    """MRI/PET paired volumes (reference `DUALGLOWDataset.py:35-103`)."""
