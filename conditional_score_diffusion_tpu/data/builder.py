"""Offline dataset builders.

Reference: `create_dataset.py:84-169` (+ older `haar_helper.py:68-178`) —
multi-level Haar decomposition of an image folder into per-resolution
folders (png at level 0, npy at deeper levels, per-level coefficient-range
report) consumed by `HaarDecomposedDataModule`; and
`lightning_data_modules/PairedDataset.py:157-191` (AB-image split builder
for edges2shoes-style side-by-side pairs).
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops.haar import haar_forward


def create_haar_dataset(
    src_dir: str,
    out_base: str,
    dataset_name: str,
    image_size: int,
    max_depth: int = 3,
    split=(0.8, 0.1, 0.1),
    seed: int = 42,
    batch: int = 64,
    limit: Optional[int] = None,
):
    """Decompose images into per-level Haar approx coefficients.

    Level 0 keeps the resized images as png; level L >= 1 stores the DC
    coefficients at resolution image_size/2^L as npy.  Prints the per-level
    coefficient ranges like the reference builder.
    """
    files = sorted(
        f for f in glob.glob(os.path.join(src_dir, "*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if limit:
        files = files[:limit]
    assert files, f"no images under {src_dir}"
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(files))
    n_train = int(split[0] * len(files))
    n_val = int(split[1] * len(files))
    phases = {
        "train": order[:n_train],
        "val": order[n_train : n_train + n_val],
        "test": order[n_train + n_val :],
    }

    ranges = {lvl: [np.inf, -np.inf] for lvl in range(max_depth + 1)}
    for phase, idxs in phases.items():
        dirs = {}
        for lvl in range(max_depth + 1):
            size = image_size // 2**lvl
            d = os.path.join(out_base, f"{dataset_name}_{size}", phase)
            Path(d).mkdir(parents=True, exist_ok=True)
            dirs[lvl] = d
        for start in range(0, len(idxs), batch):
            chunk = idxs[start : start + batch]
            imgs = []
            for j in chunk:
                img = Image.open(files[j]).convert("RGB")
                if img.size != (image_size, image_size):
                    img = img.resize((image_size, image_size), Image.BICUBIC)
                imgs.append(np.asarray(img, np.float32) / 255.0)
            approx = jnp.asarray(np.stack(imgs))
            for k, j in enumerate(chunk):
                Image.fromarray(
                    (np.asarray(approx[k]) * 255).astype(np.uint8)
                ).save(os.path.join(dirs[0], f"{j}.png"))
            ranges[0][0] = min(ranges[0][0], float(approx.min()))
            ranges[0][1] = max(ranges[0][1], float(approx.max()))
            for lvl in range(1, max_depth + 1):
                coeffs = haar_forward(approx)
                approx = coeffs[..., :3]
                ranges[lvl][0] = min(ranges[lvl][0], float(approx.min()))
                ranges[lvl][1] = max(ranges[lvl][1], float(approx.max()))
                arr = np.asarray(approx)
                for k, j in enumerate(chunk):
                    np.save(os.path.join(dirs[lvl], f"{j}.npy"), arr[k])

    for lvl, (lo, hi) in ranges.items():
        print(f"[haar builder] level {lvl}: coefficient range [{lo:.4f}, {hi:.4f}]")
    return ranges


def create_ab_paired_dataset(
    master_path: str,
    out_base: str,
    resize_size: int = 64,
    split=(0.8, 0.1, 0.1),
    seed: int = 42,
    limit: Optional[int] = None,
):
    """Split side-by-side AB images (edges2shoes layout) into A/B trees
    (reference `PairedDataset.py:157-191`)."""
    files = sorted(glob.glob(os.path.join(master_path, "*.jpg")))
    if limit:
        files = files[:limit]
    assert files, f"no AB images under {master_path}"
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(files))
    n_train = int(split[0] * len(files))
    n_val = int(split[1] * len(files))
    phases = {
        "train": order[:n_train],
        "val": order[n_train : n_train + n_val],
        "test": order[n_train + n_val :],
    }
    for phase, idxs in phases.items():
        a_dir = os.path.join(out_base, phase, "A")
        b_dir = os.path.join(out_base, phase, "B")
        Path(a_dir).mkdir(parents=True, exist_ok=True)
        Path(b_dir).mkdir(parents=True, exist_ok=True)
        for j in idxs:
            ab = Image.open(files[j]).convert("RGB")
            w, h = ab.size
            A = ab.crop((0, 0, w // 2, h))
            B = ab.crop((w // 2, 0, w, h))
            if resize_size:
                A = A.resize((resize_size, resize_size), Image.BICUBIC)
                B = B.resize((resize_size, resize_size), Image.BICUBIC)
            name = os.path.basename(files[j])
            A.save(os.path.join(a_dir, name))
            B.save(os.path.join(b_dir, name))
    print(f"[ab builder] wrote paired trees under {out_base}")


def create_dataset(config):
    """Config-driven dispatch (reference `create_dataset.py` entry used by
    `run_lib.train` when ``data.create_dataset`` is set)."""
    task = config.data.get("task", "")
    if "haar" in config.data.get("datamodule", "") or task == "multi_scale":
        return create_haar_dataset(
            src_dir=os.path.join(config.data.base_dir, config.data.dataset),
            out_base=config.data.base_dir,
            dataset_name=config.data.dataset,
            image_size=config.data.target_resolution,
            max_depth=config.data.get("max_haar_depth", 3),
            split=tuple(config.data.split),
            seed=config.seed,
        )
    if task == "image-to-image":
        return create_ab_paired_dataset(
            master_path=os.path.join(config.data.base_dir, config.data.dataset + "_AB"),
            out_base=os.path.join(config.data.base_dir, config.data.dataset),
            resize_size=config.data.image_size,
            split=tuple(config.data.split),
            seed=config.seed,
        )
    raise NotImplementedError(f"no dataset builder for task {task!r}")
