"""Offline evaluation pipeline over saved sample trees.

Reference: `evaluation.py:267-449` (`run_evaluation_pipeline`): walks
``{base_path}/images/{samples/snr_*/draw_i, x_gt, y_gt}`` aligned by file
number, computes per-draw LPIPS/PSNR/SSIM/consistency + diversity across
draws, target FID (x vs sample) and Joint FID per draw, pickles
``evaluation_info.pkl``.

Inception activations are computed in jit-compiled batches (the reference
runs image-by-image); FID math is in `fid.py`.  LPIPS and FID gate on
pretrained weights (zero-egress) — metrics that need unavailable weights
are skipped with a note in the result dict.
"""

from __future__ import annotations

import os
import pickle
from glob import glob
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .fid import fid_from_activations, joint_fid_from_activations
from .metrics import get_consistency_fn, mean_psnr, mean_ssim, psnr, ssim


def _load_images(paths: List[str]) -> np.ndarray:
    imgs = []
    for p in paths:
        arr = np.asarray(Image.open(p).convert("RGB"), dtype=np.float32) / 255.0
        imgs.append(arr)
    return np.stack(imgs)


def _numbered(d: str) -> Dict[int, str]:
    out = {}
    for p in glob(os.path.join(d, "*.png")):
        stem = os.path.splitext(os.path.basename(p))[0]
        try:
            out[int(stem)] = p
        except ValueError:
            continue
    return out


def _batched_activations(apply_fn, params, images: np.ndarray, batch: int = 32) -> np.ndarray:
    acts = []
    f = jax.jit(lambda x: apply_fn(params, x)[0])
    for i in range(0, len(images), batch):
        a = f(jnp.asarray(images[i : i + batch]))
        acts.append(np.asarray(a))
    return np.concatenate(acts)


def run_evaluation_pipeline(
    task: str,
    base_path: str,
    snr: float,
    scale: int = 8,
    inception_weights: Optional[str] = None,
    mask_coverage: Optional[float] = None,
    mask_seed_offset: int = 0,
) -> Dict:
    samples_root = os.path.join(base_path, "images", "samples", f"snr_{snr:.3f}")
    x_dir = os.path.join(base_path, "images", "x_gt")
    y_dir = os.path.join(base_path, "images", "y_gt")
    draw_dirs = sorted(glob(os.path.join(samples_root, "draw_*")))
    assert draw_dirs, f"no draws under {samples_root}"

    x_files = _numbered(x_dir)
    y_files = _numbered(y_dir)
    draw_files = {d: _numbered(d) for d in draw_dirs}

    common = set(x_files) & set(y_files)
    for files in draw_files.values():
        common &= set(files)
    ids = sorted(common)
    assert ids, "no aligned images across gt and draws"

    x = _load_images([x_files[i] for i in ids])
    y = _load_images([y_files[i] for i in ids])
    draws = {
        os.path.basename(d): _load_images([draw_files[d][i] for i in ids])
        for d in draw_dirs
    }

    results: Dict = {"snr": snr, "n_images": len(ids), "per_draw": {}, "skipped": []}

    # pixel metrics per draw
    consistency_fn = None
    try:
        consistency_fn = get_consistency_fn(task)
    except NotImplementedError:
        results["skipped"].append("consistency")

    # inpainting: re-roll the seeded test-time masks from the saved image ids
    # (PNG id k <-> dataset index mask_seed_offset + k - 1; reference
    # `evaluation.py:67-140` reconstructs mask_info the same way)
    masks = None
    if task == "inpainting" and consistency_fn is not None:
        if mask_coverage is None:
            results["skipped"].append("consistency (no mask_coverage/seeds)")
            consistency_fn = None
        else:
            from ..data.degradations import random_square_mask

            seeds = np.asarray([mask_seed_offset + i - 1 for i in ids])
            masks = random_square_mask(
                x.shape, mask_coverage, np.random.default_rng(0), seeds=seeds
            )

    lpips_fn = None
    try:
        from .lpips import load_lpips

        lpips_fn = load_lpips()
    except Exception as e:
        results["skipped"].append(f"lpips ({e})")

    per_image_lpips = {}
    for name, s in draws.items():
        entry = {
            "psnr": mean_psnr(jnp.asarray(s), jnp.asarray(x)),
            "ssim": mean_ssim(jnp.asarray(s), jnp.asarray(x)),
        }
        if consistency_fn is not None:
            if task == "super-resolution":
                entry["consistency"] = float(consistency_fn(jnp.asarray(s), jnp.asarray(x), scale))
            elif task == "image-to-image":
                entry["consistency"] = float(consistency_fn(jnp.asarray(s), jnp.asarray(x)))
            elif task == "inpainting" and masks is not None:
                entry["consistency"] = float(
                    consistency_fn(jnp.asarray(s), jnp.asarray(x), jnp.asarray(masks))
                )
        if lpips_fn is not None:
            vals = np.asarray(lpips_fn(jnp.asarray(x), jnp.asarray(s)))
            entry["lpips"] = float(vals.mean())
            per_image_lpips[name] = vals
        results["per_draw"][name] = entry

    # diversity across draws
    if len(draws) > 1:
        stack = np.stack(list(draws.values()))
        results["diversity"] = float(np.mean(np.std(stack, axis=0)))

    # FID / Joint FID per draw (needs inception weights)
    try:
        from .inception import create_inception, load_fid_inception_params

        params = load_fid_inception_params(inception_weights)
        apply_fn, params = create_inception((3,), params=params)
        acts_x = _batched_activations(apply_fn, params, x)
        acts_y = _batched_activations(apply_fn, params, y)
        fids, jfids = [], []
        for name, s in draws.items():
            acts_s = _batched_activations(apply_fn, params, s)
            fids.append(fid_from_activations(acts_x, acts_s))
            jfids.append(joint_fid_from_activations(acts_y, acts_x, acts_s))
        results["fid"] = {"mean": float(np.mean(fids)), "std": float(np.std(fids))}
        results["joint_fid"] = {"mean": float(np.mean(jfids)), "std": float(np.std(jfids))}
    except FileNotFoundError as e:
        results["skipped"].append(f"fid ({e})")

    # best-25 sample ids by LPIPS (reference `evaluation.py:415-430`)
    if per_image_lpips:
        mean_lpips = np.mean(np.stack(list(per_image_lpips.values())), axis=0)
        order = np.argsort(mean_lpips)[:25]
        results["best_25_lpips_ids"] = [ids[i] for i in order]

    with open(os.path.join(base_path, "evaluation_info.pkl"), "wb") as f:
        pickle.dump(results, f)
    return results
