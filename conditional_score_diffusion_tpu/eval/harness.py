"""Test-mode harness: sample on the test split, save PNG trees, compute
metrics.

Reference: `run_lib.test` (`run_lib.py:77-104`) +
`TestPairedVisualizationCallback` (`lightning_callbacks/PairedCallback.py:94-259`):
per test batch in [first_test_batch, last_test_batch), for each snr in
``eval.snr`` and each draw in ``eval.draws``, run the conditional sampler,
clamp to [0,1], save PNGs under
``{base_log_dir}/{task}/{dataset}/{approach}/images/{samples,x_gt,y_gt}``
(samples further under ``snr_%.3f/draw_%d``), compute
lpips/psnr/ssim/consistency/diversity, pickle
``test_metrics/{first}_{last}.pkl``.

TPU design: the sampler is jitted once per (snr) and reused across batches
and draws; metrics run as batched jnp ops.  LPIPS requires pretrained
AlexNet weights (see `eval/lpips.py`) and is skipped with a warning when no
weights are available (zero-egress environments).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data import create_datamodule
from ..models import init_model
from ..sampling import get_conditional_sampling_fn
from ..sde import build_sde
from ..training.checkpoint import CheckpointManager
from ..training.schedules import is_decreasing_variance, sigma_y_at_step
from ..training.state import create_train_state
from .metrics import diversity as diversity_metric
from .metrics import get_consistency_fn, mean_psnr, mean_ssim


def _save_png(img01: np.ndarray, path: str):
    arr = np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def _load_state(config, module, params, checkpoint_path: Optional[str]):
    state = create_train_state(config, params)
    ckpt_dir = checkpoint_path or config.model.get("checkpoint_path", "")
    if ckpt_dir and os.path.isdir(ckpt_dir):
        mgr = CheckpointManager(ckpt_dir)
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
        mgr.close()
    return state


def run_test(config, log_path: str, checkpoint_path: Optional[str] = None) -> Dict:
    evalc = config.eval
    approach = config.training.get("conditioning_approach", "unconditional")
    base = os.path.join(
        evalc.base_log_dir, config.data.task, config.data.dataset, approach
    )
    samples_dir = os.path.join(base, "images", "samples")
    gt_x_dir = os.path.join(base, "images", "x_gt")
    gt_y_dir = os.path.join(base, "images", "y_gt")
    for d in (samples_dir, gt_x_dir, gt_y_dir):
        Path(d).mkdir(parents=True, exist_ok=True)

    datamodule = create_datamodule(config)
    datamodule.setup()

    rng = jax.random.key(config.seed)
    module, params = init_model(config, rng)
    state = _load_state(config, module, params, checkpoint_path)
    params = state.ema.params

    # VS-CMDE: restore sigma_y from the schedule at the checkpointed step
    # (reference `callbacks.py:75-78` restores from buffers).
    if is_decreasing_variance(config):
        smin_y, smax_y = sigma_y_at_step(config, int(state.step))
        sde, eps = build_sde(config, sigma_min_y=float(smin_y), sigma_max_y=float(smax_y))
    else:
        sde, eps = build_sde(config)

    snr_list = evalc.snr if isinstance(evalc.snr, list) else [evalc.snr]
    draws = list(evalc.draws)
    metrics_list = list(evalc.evaluation_metrics)
    if "diversity" in metrics_list and len(draws) == 1:
        metrics_list.remove("diversity")

    lpips_fn = None
    if "lpips" in metrics_list:
        try:
            from .lpips import load_lpips

            lpips_fn = load_lpips()
        except Exception as e:  # pragma: no cover - weight availability
            print(f"[test] LPIPS unavailable ({e}); skipping lpips metric.")
            metrics_list.remove("lpips")

    shape_x = tuple(config.data.shape_x)
    sample_shape = (evalc.batch_size,) + tuple(shape_x[1:]) + (shape_x[0],)

    consistency_fn = None
    if "consistency" in metrics_list:
        try:
            consistency_fn = get_consistency_fn(config.data.task)
        except NotImplementedError:
            metrics_list.remove("consistency")

    results = {
        e_snr: {m: [] for m in metrics_list} for e_snr in snr_list
    }
    samplers = {}
    for e_snr in snr_list:
        fn = get_conditional_sampling_fn(
            config, sde, sample_shape, eps, module,
            predictor=evalc.predictor, corrector=evalc.corrector,
            p_steps=evalc.p_steps, c_steps=evalc.c_steps, snr=e_snr,
            denoise=evalc.denoise,
            use_path=evalc.use_path if "use_path" in evalc else "default",
        )
        # Batch-shard sampling over the device mesh when the eval batch
        # divides the device count (DDP-inference equivalent; scales the
        # test harness linearly across chips).
        if len(jax.devices()) > 1 and evalc.batch_size % len(jax.devices()) == 0:
            from ..parallel import make_mesh, shard_sampling_fn

            mesh = make_mesh()
            sharded = shard_sampling_fn(
                lambda r, p, y, fn=fn: fn(r, p, y), mesh
            )
            samplers[e_snr] = lambda r, p, y, fn=sharded: fn(r, p, y)[0]
        else:
            samplers[e_snr] = jax.jit(lambda r, p, y, fn=fn: fn(r, p, y)[0])
        for draw in draws:
            Path(os.path.join(samples_dir, f"snr_{e_snr:.3f}", f"draw_{draw}")).mkdir(
                parents=True, exist_ok=True
            )

    images_tested = evalc.batch_size * evalc.first_test_batch
    sample_rng = jax.random.key(config.seed + 17)

    for batch_idx, batch in enumerate(datamodule.test_iterator()):
        if batch_idx < evalc.first_test_batch:
            continue
        if batch_idx >= evalc.last_test_batch:
            break
        x_gt = jnp.asarray(batch["x"])
        y = jnp.asarray(batch["y"])

        if evalc.save_samples:
            for i in range(x_gt.shape[0]):
                _save_png(x_gt[i], os.path.join(gt_x_dir, f"{images_tested + i + 1}.png"))
                _save_png(y[i], os.path.join(gt_y_dir, f"{images_tested + i + 1}.png"))

        for e_snr in snr_list:
            per_draw = {m: [] for m in metrics_list}
            draw_stack = []
            for draw in draws:
                sample_rng, dr = jax.random.split(sample_rng)
                samples = samplers[e_snr](dr, params, y)
                samples = jnp.clip(samples, 0.0, 1.0)

                if evalc.save_samples:
                    ddir = os.path.join(samples_dir, f"snr_{e_snr:.3f}", f"draw_{draw}")
                    for i in range(samples.shape[0]):
                        _save_png(samples[i], os.path.join(ddir, f"{images_tested + i + 1}.png"))

                if "lpips" in metrics_list:
                    per_draw["lpips"].append(float(np.mean(lpips_fn(x_gt, samples))))
                if "psnr" in metrics_list:
                    per_draw["psnr"].append(mean_psnr(samples, x_gt))
                if "ssim" in metrics_list:
                    per_draw["ssim"].append(mean_ssim(samples, x_gt))
                if "consistency" in metrics_list and consistency_fn is not None:
                    if config.data.task == "super-resolution":
                        per_draw["consistency"].append(
                            consistency_fn(samples, x_gt, config.data.scale)
                        )
                    elif config.data.task == "inpainting" and "mask" in batch:
                        per_draw["consistency"].append(
                            consistency_fn(samples, x_gt, jnp.asarray(batch["mask"]))
                        )
                    else:
                        per_draw["consistency"].append(consistency_fn(samples, x_gt))
                if "diversity" in metrics_list:
                    draw_stack.append(samples)

            for m in metrics_list:
                if m == "diversity":
                    results[e_snr][m].append(diversity_metric(jnp.stack(draw_stack) * 255.0))
                else:
                    results[e_snr][m].append(float(np.mean(per_draw[m])))

        images_tested += x_gt.shape[0]
        print(f"[test] batch {batch_idx} done ({images_tested} images)", flush=True)

    # optional bits/dim over the test split (reference eval.enable_bpd,
    # `configs/default_cifar10_configs.py:37-38`)
    if evalc.get("enable_bpd", False) and "conditioning_approach" not in config.training:
        from .bpd import evaluate_bpd

        results["bpd"] = evaluate_bpd(config, module, params, datamodule)

    metrics_dir = os.path.join(base, "test_metrics")
    Path(metrics_dir).mkdir(parents=True, exist_ok=True)
    out_file = os.path.join(
        metrics_dir, f"{evalc.first_test_batch}_{evalc.last_test_batch}.pkl"
    )
    with open(out_file, "wb") as f:
        pickle.dump(results, f)

    for e_snr in snr_list:
        for m in metrics_list:
            vals = results[e_snr][m]
            if vals:
                print(f"snr: {e_snr:.3f} - eval metric: {m} --- mean value: {np.mean(vals):.5f}")
    return results
