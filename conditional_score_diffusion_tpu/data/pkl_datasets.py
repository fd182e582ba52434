"""SRFlow-style .pklv4 datasets: LRHR, General (task degradations), Haar.

Reference: `lightning_data_modules/SRFLOWDataset.py` — pickled lists of HWC
uint8 arrays (DF2K, CelebAHq_160_MBic); `LRHR_PKLDataset` with
crop/flip/rot augmentation and optional NN-upscale of lr (`:79-181`),
`General_PKLDataset` with on-the-fly SR/colorization/inpainting
degradations (`:261-327`), `Haar_PKLDataset` with multi-level Haar maps
(`:183-259`).

Batches are NHWC float32 in [0,1]; conditional pairs yield
``{'x': target, 'y': condition}`` (reference returns ``(y, x)`` tuples).
For inpainting the batch also carries ``'mask'`` so mask-dependent metrics
don't have to re-roll it.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from . import register_datamodule
from .native import assemble_batch
from .degradations import (
    bicubic_resize_np,
    grayscale,
    inpainting_degrade,
    nearest_upsample_np,
    random_crop,
    random_flip,
    random_rotation,
    random_square_mask,
    sr_degrade,
)

_PKL_FILES = {
    # dataset -> phase -> (LQ_file, GT_file)  (reference `SRFLOWDataset.py:16-48`)
    "DF2K": {
        "train": ("DF2K-tr_X4.pklv4", "DF2K-tr.pklv4"),
        "val": ("DIV2K-va_X4.pklv4", "DIV2K-va.pklv4"),
        "test": ("DIV2K-teFullMod8_X4.pklv4", "DIV2K-teFullMod8.pklv4"),
    },
    "celebA-HQ-160": {
        "train": ("CelebAHq_160_MBic_tr_X8.pklv4", "CelebAHq_160_MBic_tr.pklv4"),
        "val": ("CelebAHq_160_MBic_va_X8.pklv4", "CelebAHq_160_MBic_va.pklv4"),
        "test": ("CelebAHq_160_MBic_va_X8.pklv4", "CelebAHq_160_MBic_va.pklv4"),
    },
}


def pkl_paths(config, phase: str) -> Dict[str, str]:
    dataset = config.data.dataset
    base = os.path.join(config.data.base_dir, dataset)
    if dataset not in _PKL_FILES:
        # generic convention for locally-built datasets:
        #   {base_dir}/{dataset}/{dataset}-{phase}.pklv4        (GT)
        #   {base_dir}/{dataset}/{dataset}-{phase}_X{scale}.pklv4  (LQ, optional)
        gt = f"{dataset}-{phase}.pklv4"
        scale = config.data.get("scale", 4)
        lq = f"{dataset}-{phase}_X{scale}.pklv4"
        if os.path.exists(os.path.join(base, gt)):
            return {"LQ": os.path.join(base, lq), "GT": os.path.join(base, gt)}
        raise NotImplementedError(f"{dataset} is not supported.")
    lq, gt = _PKL_FILES[dataset][phase]
    return {"LQ": os.path.join(base, lq), "GT": os.path.join(base, gt)}


def load_pkl_images(path: str, n_max: int = int(1e9)) -> List[np.ndarray]:
    """HWC uint8 image list from a .pklv4 file."""
    assert os.path.isfile(path), path
    with open(path, "rb") as f:
        images = pickle.load(f)
    assert len(images) > 0, path
    return [np.asarray(im) for im in images[:n_max]]


class _PKLBase:
    def __init__(self, config):
        self.config = config
        self.seed = config.seed

    def setup(self):
        raise NotImplementedError

    def _iterate(self, items, batch_size, shuffle, loop, make_batch, seed_offset=0):
        rng = np.random.default_rng(self.seed + seed_offset)
        n = len(items)
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i : i + batch_size]
                yield make_batch(idx, rng)
            if not loop:
                return


@register_datamodule(name="LRHR_PKLDataset")
class LRHRPKLDataModule(_PKLBase):
    """Paired LR/HR .pklv4 pairs with augmentation
    (reference `SRFLOWDataset.py:79-181`)."""

    def setup(self):
        c = self.config
        self.images = {}
        for phase in ("train", "val", "test"):
            paths = pkl_paths(c, phase)
            self.images[phase] = {
                "lr": load_pkl_images(paths["LQ"]),
                "hr": load_pkl_images(paths["GT"]),
            }

    def _make_batch_fn(self, phase):
        c = self.config
        use_flip = c.data.use_flip and phase == "train"
        use_rot = c.data.use_rot and phase == "train"
        use_crop = c.data.use_crop
        crop_size = c.data.image_size
        scale = c.data.scale
        # default False: the reference sequential-bicubic recipes omit the
        # key entirely (reference `configs/ve/srflow/celebAHQ160/sequential/
        # bicubic/config_160.py:75-93` vs `SRFLOWDataset.py:92`, which reads
        # it unconditionally and would crash — a reference quirk not copied)
        upscale_lr = c.data.get("upscale_lr", False)
        lrs, hrs = self.images[phase]["lr"], self.images[phase]["hr"]

        def make_batch(idx, rng):
            if not use_crop and not use_rot:
                # fast path: u8 -> f32 batch assembly (+joint flip, +NN
                # upsample of lr) in the GIL-released C++ extension
                flips = (rng.random(len(idx)) < 0.5).astype(np.uint8) if use_flip else None
                hr_list = [hrs[i] for i in idx]
                lr_list = [lrs[i] for i in idx]
                up = (hr_list[0].shape[0] // lr_list[0].shape[0]) if upscale_lr else 1
                x = assemble_batch(hr_list, up=1, flips=flips)
                y = assemble_batch(lr_list, up=up, flips=flips)
                return {"x": x, "y": y}
            xs, ys = [], []
            for i in idx:
                hr, lr = hrs[i], lrs[i]
                if use_crop:
                    hr, lr = random_crop(hr, lr, crop_size, scale, rng)
                if use_flip:
                    hr, lr = random_flip(hr, lr, rng=rng)
                if use_rot:
                    hr, lr = random_rotation(hr, lr, rng=rng)
                xs.append(hr)
                ys.append(lr)
            x = np.stack(xs).astype(np.float32) / 255.0
            y = np.stack(ys).astype(np.float32) / 255.0
            if upscale_lr:
                y = nearest_upsample_np(y, x.shape[1] // y.shape[1])
            return {"x": x, "y": y}

        return make_batch

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        return self._iterate(
            self.images["train"]["hr"], bs, True, True, self._make_batch_fn("train")
        )

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(
            self.images["val"]["hr"], bs, False, False, self._make_batch_fn("val")
        )

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(
            self.images["test"]["hr"], bs, False, False, self._make_batch_fn("test")
        )


@register_datamodule(name="General_PKLDataset")
class GeneralPKLDataModule(_PKLBase):
    """On-the-fly task degradation of GT images
    (reference `SRFLOWDataset.py:261-327`)."""

    def setup(self):
        c = self.config
        self.images = {}
        for phase in ("train", "val", "test"):
            self.images[phase] = load_pkl_images(pkl_paths(c, phase)["GT"])

    def _make_batch_fn(self, phase):
        c = self.config
        task = c.data.task
        scale = c.data.get("scale", 4)
        mask_coverage = c.data.get("mask_coverage", 0.25)
        image_size = c.data.image_size
        use_flip = c.data.use_flip and phase == "train"
        use_seed = phase == "test" and c.eval.get("use_seed", False)
        images = self.images[phase]

        def make_batch(idx, rng):
            flips = (rng.random(len(idx)) < 0.5).astype(np.uint8) if use_flip else None
            x = assemble_batch([images[i] for i in idx], flips=flips)
            if x.shape[1] != image_size:
                x = bicubic_resize_np(x, image_size)

            if task == "super-resolution":
                return {"x": x, "y": sr_degrade(x, scale)}
            if task == "colorization":
                return {"x": x, "y": grayscale(x)}
            if task == "inpainting":
                seeds = np.asarray(idx) if use_seed else None
                mask = random_square_mask(x.shape, mask_coverage, rng, seeds=seeds)
                return {"x": x, "y": inpainting_degrade(x, mask), "mask": mask}
            raise NotImplementedError(f"task {task!r} not supported")

        return make_batch

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        return self._iterate(self.images["train"], bs, True, True, self._make_batch_fn("train"))

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.images["val"], bs, False, False, self._make_batch_fn("val"))

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.images["test"], bs, False, False, self._make_batch_fn("test"))


@register_datamodule(name="Haar_PKLDataset")
class HaarPKLDataModule(_PKLBase):
    """Multi-level Haar coefficient maps (reference `SRFLOWDataset.py:183-259`).

    ``data.map``: 'approx to detail' | 'bicubic to approx' | 'bicubic to haar'.
    """

    def setup(self):
        c = self.config
        self.images = {}
        for phase in ("train", "val", "test"):
            paths = pkl_paths(c, phase)
            self.images[phase] = {
                "lr": load_pkl_images(paths["LQ"]),
                "hr": load_pkl_images(paths["GT"]),
            }

    def _make_batch_fn(self, phase):
        import jax.numpy as jnp

        from ..ops.haar import multi_level_haar_forward

        c = self.config
        level = c.data.level
        mapping = c.data.map
        use_flip = c.data.use_flip and phase == "train"
        lrs, hrs = self.images[phase]["lr"], self.images[phase]["hr"]

        def make_batch(idx, rng):
            xs, ys = [], []
            for i in idx:
                hr, lr = hrs[i], lrs[i]
                if use_flip:
                    hr, lr = random_flip(hr, lr, rng=rng)
                xs.append(hr)
                ys.append(lr)
            hr = np.stack(xs).astype(np.float32) / 255.0
            lr = np.stack(ys).astype(np.float32) / 255.0
            approx, detail = multi_level_haar_forward(jnp.asarray(hr), level + 1)
            approx, detail = np.asarray(approx), np.asarray(detail)
            if mapping == "approx to detail":
                return {"x": detail, "y": approx}
            if mapping == "bicubic to approx":
                return {"x": approx, "y": lr}
            if mapping == "bicubic to haar":
                return {"x": np.concatenate([approx, detail], axis=-1), "y": lr}
            raise NotImplementedError(f"Mapping <<{mapping}>> is not supported")

        return make_batch

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        return self._iterate(self.images["train"]["hr"], bs, True, True, self._make_batch_fn("train"))

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.images["val"]["hr"], bs, False, False, self._make_batch_fn("val"))

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.images["test"]["hr"], bs, False, False, self._make_batch_fn("test"))


@register_datamodule(name="unpaired_PKLDataset")
class UnpairedPKLDataModule(_PKLBase):
    """Unconditional GT images from .pklv4 lists."""

    def setup(self):
        c = self.config
        self.images = {}
        for phase in ("train", "val", "test"):
            self.images[phase] = load_pkl_images(pkl_paths(c, phase)["GT"])

    def _make_batch_fn(self, phase):
        c = self.config
        image_size = c.data.image_size
        use_flip = c.data.get("use_flip", False) and phase == "train"
        images = self.images[phase]

        def make_batch(idx, rng):
            xs = []
            for i in idx:
                hr = images[i].astype(np.float32) / 255.0
                if use_flip and rng.random() < 0.5:
                    hr = np.ascontiguousarray(hr[:, ::-1, :])
                xs.append(hr)
            x = np.stack(xs)
            if x.shape[1] != image_size:
                x = bicubic_resize_np(x, image_size)
            return x

        return make_batch

    def train_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.training.batch_size
        return self._iterate(self.images["train"], bs, True, True, self._make_batch_fn("train"))

    def val_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.images["val"], bs, False, False, self._make_batch_fn("val"))

    def test_iterator(self, batch_size: Optional[int] = None):
        bs = batch_size or self.config.eval.batch_size
        return self._iterate(self.images["test"], bs, False, False, self._make_batch_fn("test"))
