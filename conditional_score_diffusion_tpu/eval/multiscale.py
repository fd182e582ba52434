"""Autoregressive multi-scale generation across per-scale models.

Reference: `run_lib.multi_scale_test` (`run_lib.py:113-332`): a master
config holds one sub-config per scale; each scale's model is loaded from its
checkpoint; generation chains scales autoregressively in either coordinate
space:

  * ``bicubic``: the previous scale's sample (upscaled LR) conditions the
    next conditional SR model (`run_lib.py:149-163`);
  * ``haar``: the previous scale's image is the DC band; the model samples
    the HF detail bands; inverse Haar yields the next-scale image
    (`run_lib.py:165-215`).

Fidelity items mirrored from the reference script code
(`run_lib.py:224-239,301-332`):

  * the GT pyramid: the highest-scale datamodule provides the GT batch
    (haar space: ``haar_backward(cat(bands))``; bicubic space: the HR item);
  * ``rescale_and_concatenate``: every intermediate image NN-upsampled to
    the final resolution, per-image min-max normalized, concatenated along
    width with the normalized GT on the right, gridded with nrow=1 and
    logged to TensorBoard as ``Autoregressive_Sampling_batch_%d``;
  * per-band normalized Haar supergrids of each scale's (dc | sampled HF)
    coefficients (the reference's ``normalise_per_band``/``create_supergrid``
    evolution visualization, `run_lib.py:185-193`).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import create_datamodule
from ..models import init_model
from ..ops.haar import haar_backward
from ..training.callbacks import _normalise_per_image, haar_supergrid, image_grid
from ..training.checkpoint import CheckpointManager
from ..training.state import create_train_state
from ..training.tasks import create_task


def _load_scale(config, checkpoint_path: Optional[str] = None):
    module, params = init_model(config, jax.random.key(config.seed))
    state = create_train_state(config, params)
    ckpt = checkpoint_path or config.model.get("checkpoint_path", "")
    if ckpt and os.path.isdir(ckpt):
        mgr = CheckpointManager(ckpt)
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
        mgr.close()
    task = create_task(config, module)
    if hasattr(task, "reconfigure"):
        task.reconfigure(int(state.step))
    return task, state


def _nearest_up(x: np.ndarray, factor: int) -> np.ndarray:
    """NN upsample [B,H,W,C] by an integer factor (reference
    `Upsample(mode='nearest')`, `run_lib.py:236`)."""
    return np.repeat(np.repeat(x, factor, axis=1), factor, axis=2)


def rescale_and_concatenate(intermediate_images: List[np.ndarray]) -> np.ndarray:
    """Reference `run_lib.rescale_and_concatenate` (`run_lib.py:224-239`):
    NN-upsample every pyramid level to the final resolution, per-image
    min-max normalize, and concatenate along width."""
    max_h = intermediate_images[-1].shape[1]
    upsampled = []
    for image in intermediate_images:
        factor = max_h // image.shape[1]
        if factor > 1:
            image = _nearest_up(image, factor)
        upsampled.append(_normalise_per_image(image.astype(np.float32)))
    return np.concatenate(upsampled, axis=2)


def _save_png(arr: np.ndarray, path: str):
    from PIL import Image

    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def run_multi_scale_test(
    master_config,
    log_path: str,
    p_steps: int = 2000,
    corrector: str = "conditional_none",
    num_batches: int = 1,
) -> List[np.ndarray]:
    """Returns the list of final-scale sample batches (pyramids + supergrids
    are logged to TensorBoard and saved as PNGs)."""
    coord_space = master_config.get("coordinate_space", "haar")
    scale_keys = [k for k in master_config.keys() if k.startswith(("scale", "config"))]
    if not scale_keys:
        scale_keys = [
            k for k, v in master_config.items()
            if hasattr(v, "get") and "training" in v
        ]
    scale_keys = sorted(scale_keys)
    assert scale_keys, "master config has no per-scale sub-configs"

    scales = []
    for k in scale_keys:
        config = master_config[k]
        task, state = _load_scale(config)
        scales.append((config, task, state))
    # chain low -> high resolution (the reference keys scale_info by
    # image_size, `run_lib.py:264-278`); lexicographic key order would put
    # config_160 before config_40
    scales.sort(key=lambda s: int(s[0].data.image_size))

    # Lowest-scale conditioning comes from the first config's test split; the
    # GT batch comes from the highest-scale config's test split (reference
    # zips min- and max-scale test dataloaders, `run_lib.py:301-313`).
    dm = create_datamodule(scales[0][0])
    dm.setup()
    gt_dm = create_datamodule(scales[-1][0])
    gt_dm.setup()

    out_dir = os.path.join(log_path, "multi_scale")
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(log_path, "autoregressive_samples"))
    except ImportError:  # pragma: no cover
        pass

    results = []
    chain_metrics = []
    rng = jax.random.key(master_config.get("seed", 42))
    for batch_idx, (batch, gt_batch) in enumerate(zip(dm.test_iterator(), gt_dm.test_iterator())):
        if batch_idx >= num_batches:
            break
        current = jnp.asarray(batch["y"] if isinstance(batch, dict) else batch)
        pyramid = [np.asarray(current)]

        for scale_idx, (config, task, state) in enumerate(scales):
            rng, sample_rng = jax.random.split(rng)
            c, h, w = config.data.shape_x
            shape = (current.shape[0], h, w, c)
            # The conv/fusion dispatch policies are process-global trace-time
            # state; with several models in one process the last create_model
            # call would otherwise win.  Re-apply THIS scale's knobs right
            # before its sampler traces (layers.apply_dispatch_config).
            from ..models.layers import apply_dispatch_config

            apply_dispatch_config(config.model)
            fn = task.sampling_fn(shape, p_steps=p_steps, corrector=corrector)
            if task.conditional:
                samples, _ = fn(sample_rng, state.ema.params, current)
            else:
                samples, _ = fn(sample_rng, state.ema.params)

            if coord_space == "haar":
                # samples are the HF detail bands; current is the DC band.
                full = jnp.concatenate([current, samples], axis=-1)
                if writer is not None:
                    # per-band normalized supergrid of (dc | hf) coefficients
                    grid = haar_supergrid(np.asarray(full))
                    writer.add_image(
                        f"haar_supergrid_scale_{scale_idx}_batch_{batch_idx}",
                        np.transpose(grid, (2, 0, 1)),
                    )
                current = haar_backward(full)
            else:  # bicubic: the sample becomes the next scale's conditioning
                current = jnp.clip(samples, 0.0, 1.0)
            pyramid.append(np.asarray(current))

        # GT at the highest scale (reference `run_lib.py:317-320`)
        if isinstance(gt_batch, dict):
            if coord_space == "haar":
                bands = jnp.concatenate(
                    [jnp.asarray(gt_batch["y"]), jnp.asarray(gt_batch["x"])], axis=-1
                )
                gt = np.asarray(haar_backward(bands))
            else:
                gt = np.asarray(gt_batch["x"])
        else:
            gt = np.asarray(gt_batch)

        # concatenated pyramid | GT, gridded one row per item
        pyr = rescale_and_concatenate(pyramid)
        n = min(pyr.shape[0], gt.shape[0])
        vis = np.concatenate(
            [pyr[:n], _normalise_per_image(gt[:n].astype(np.float32))], axis=2
        )
        grid = image_grid(vis, nrow=1)
        if writer is not None:
            writer.add_image(
                f"Autoregressive_Sampling_batch_{batch_idx}",
                np.transpose(grid, (2, 0, 1)),
            )
        _save_png(grid, os.path.join(out_dir, f"pyramid_batch{batch_idx}.png"))

        # Quantitative chain metrics: the reference only logs the pyramid
        # visually (reference run_lib.py:224-239); we additionally record
        # PSNR/SSIM of the chained final-scale output against GT
        # (VERDICT round-3 item 4).
        from .metrics import mean_psnr, mean_ssim

        final = np.clip(pyramid[-1][:n].astype(np.float32), 0.0, 1.0)
        gt_img = np.clip(gt[:n].astype(np.float32), 0.0, 1.0)
        m = {
            "batch": batch_idx,
            "n": int(n),
            "psnr": mean_psnr(final, gt_img),
            "ssim": mean_ssim(final, gt_img),
        }
        if coord_space == "haar":
            # Zero-detail control: chain the same DC band through
            # haar_backward with all detail bands zero.  Pure math (no
            # sampling) — the bar a trained chain must beat for its detail
            # models to be adding rather than subtracting fidelity.
            dc_only = jnp.asarray(batch["y"] if isinstance(batch, dict) else batch)
            for config, _, _ in scales:
                c = config.data.shape_x[0]
                dc_only = haar_backward(
                    jnp.concatenate(
                        [dc_only, jnp.zeros(dc_only.shape[:-1] + (c,), dc_only.dtype)],
                        axis=-1,
                    )
                )
            dc_img = np.clip(np.asarray(dc_only)[:n].astype(np.float32), 0.0, 1.0)
            m["dc_only_psnr"] = mean_psnr(dc_img, gt_img)
            m["dc_only_ssim"] = mean_ssim(dc_img, gt_img)
        chain_metrics.append(m)
        print(f"[multi_scale] batch {batch_idx} chain metrics: {m}", flush=True)

        results.append(pyramid[-1])
        for i in range(pyramid[-1].shape[0]):
            _save_png(
                pyramid[-1][i], os.path.join(out_dir, f"batch{batch_idx}_{i}.png")
            )
        print(f"[multi_scale] batch {batch_idx}: final {pyramid[-1].shape}", flush=True)
    if chain_metrics:
        import json

        summary = {
            "per_batch": chain_metrics,
            "mean_psnr": float(np.mean([m["psnr"] for m in chain_metrics])),
            "mean_ssim": float(np.mean([m["ssim"] for m in chain_metrics])),
            "coordinate_space": coord_space,
            "p_steps": p_steps,
        }
        if all("dc_only_psnr" in m for m in chain_metrics):
            summary["dc_only_mean_psnr"] = float(
                np.mean([m["dc_only_psnr"] for m in chain_metrics])
            )
            summary["dc_only_mean_ssim"] = float(
                np.mean([m["dc_only_ssim"] for m in chain_metrics])
            )
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(summary, f, indent=1)
    if writer is not None:
        writer.close()
    return results
