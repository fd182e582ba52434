"""Build a small offline natural-image patch dataset (`texture64`).

This environment has no network egress and ships no image datasets, but
scikit-learn bundles two full-size photographs (`load_sample_images`:
china.jpg + flower.jpg, 427x640 RGB).  Dense 64x64 crops of them give
thousands of distinct natural-image patches — enough signal to train a
*recognizable* SR CMDE artifact on the real TPU (VERDICT round-1 item 5).

Writes `datasets/texture64/texture64-{train,val,test}.pklv4` in the
SRFlow pklv4 convention (pickled list of HWC uint8 arrays) consumed by
`General_PKLDataset` via the local-dataset fallback in
`data/pkl_datasets.py:pkl_paths`.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def build(out_dir: str, size: int = 64, stride: int = 16, seed: int = 0,
          lq_scales: tuple = ()) -> None:
    from sklearn.datasets import load_sample_images

    images = load_sample_images().images  # [china, flower], HWC uint8
    crops = []
    for img in images:
        arr = np.asarray(img, dtype=np.uint8)
        H, W, _ = arr.shape
        for i in range(0, H - size + 1, stride):
            for j in range(0, W - size + 1, stride):
                crops.append(arr[i : i + size, j : j + size])
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(crops))
    crops = [crops[i] for i in order]
    n = len(crops)
    n_val = max(16, n // 20)
    splits = {
        "train": crops[: n - 2 * n_val],
        "val": crops[n - 2 * n_val : n - n_val],
        "test": crops[n - n_val :],
    }
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.basename(os.path.normpath(out_dir))
    for phase, items in splits.items():
        path = os.path.join(out_dir, f"{name}-{phase}.pklv4")
        with open(path, "wb") as f:
            pickle.dump(items, f)
        print(f"{path}: {len(items)} crops of {size}x{size}")
        for s in lq_scales:
            from conditional_score_diffusion_tpu.data.degradations import bicubic_resize_np

            lq = [
                np.clip(
                    bicubic_resize_np(im[None].astype(np.float32) / 255.0, size // s)[0]
                    * 255.0, 0, 255,
                ).astype(np.uint8)
                for im in items
            ]
            lq_path = os.path.join(out_dir, f"{name}-{phase}_X{s}.pklv4")
            with open(lq_path, "wb") as f:
                pickle.dump(lq, f)
            print(f"{lq_path}: {len(lq)} crops of {size//s}x{size//s}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/texture64")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--stride", type=int, default=16)
    ap.add_argument("--lq-scales", type=int, nargs="*", default=[])
    args = ap.parse_args()
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    build(args.out, args.size, args.stride, lq_scales=tuple(args.lq_scales))
