"""Inverse-problem config builders: inpainting / colorization /
image-to-image translation.

Reference: `configs/ve/inverse_problems/{inpainting,colorization,
image_to_image_translation}/...` — one builder per task, parameterized by
the conditional estimator (ours_NDV/ours_DV/song/sr3) instead of five
near-identical files per task.  Key per-task settings mirrored:

  * inpainting:   celebA-HQ-160 @128px, General_PKLDataset, attn (16,8,4),
                  sigma_max_y=1, batch 25, seeded test masks
  * colorization: celebA-HQ-160 @128px, General_PKLDataset, attn (16,8,4),
                  sigma_max_y=0.1, batch 25
  * image-to-image (edges2shoes): paired datamodule @64px, nf=128,
                  ch_mult (1,1,2,2), attn (16,8)
"""

from __future__ import annotations

import numpy as np

from .base import base_config


_TASK_DEFAULTS = {
    "inpainting": dict(
        dataset="celebA-HQ-160", datamodule="General_PKLDataset", image_size=128,
        nf=96, ch_mult=(1, 1, 2, 2, 3, 3), attn=(16, 8, 4),
        sigma_max_y_ndv=1.0, batch=25, eval_batch=25,
        metrics=["lpips", "psnr", "ssim", "diversity"], use_seed=True,
    ),
    "colorization": dict(
        dataset="celebA-HQ-160", datamodule="General_PKLDataset", image_size=128,
        nf=96, ch_mult=(1, 1, 2, 2, 3, 3), attn=(16, 8, 4),
        sigma_max_y_ndv=0.1, batch=25, eval_batch=25,
        metrics=["lpips", "psnr", "ssim", "diversity"], use_seed=False,
    ),
    "image-to-image": dict(
        dataset="edges2shoes", datamodule="paired", image_size=64,
        nf=128, ch_mult=(1, 1, 2, 2), attn=(16, 8),
        sigma_max_y_ndv=1.0, batch=50, eval_batch=50,
        metrics=["lpips", "psnr", "ssim", "diversity"], use_seed=False,
    ),
}


def inverse_problem_config(task: str, approach: str):
    """task in _TASK_DEFAULTS; approach in {'ours_NDV','ours_DV','song','sr3'}."""
    if task not in _TASK_DEFAULTS:
        raise KeyError(
            f"task {task!r} not in {sorted(_TASK_DEFAULTS)}; for super-resolution "
            "use configs.celeba_sr.celeba_sr_160_config"
        )
    d = _TASK_DEFAULTS[task]
    config = base_config()

    training = config.training
    training.lightning_module = (
        "conditional_decreasing_variance" if approach == "ours_DV" else "conditional"
    )
    training.conditioning_approach = "Song" if approach == "song" else approach
    training.batch_size = d["batch"]
    training.n_iters = 250000 if task == "colorization" else 500000
    training.visualization_callback = "paired"
    training.likelihood_weighting = True
    training.continuous = True
    training.reduce_mean = True
    training.sde = "vesde"

    sampling = config.sampling
    sampling.predictor = "conditional_reverse_diffusion"
    sampling.corrector = "conditional_langevin"
    sampling.snr = 0.15

    evaluate = config.eval
    evaluate.callback = "test_paired"
    evaluate.evaluation_metrics = list(d["metrics"])
    evaluate.batch_size = d["eval_batch"]
    evaluate.snr = [0.15]
    evaluate.draws = [2, 3, 4, 5]
    if task == "image-to-image":
        evaluate.first_test_batch = 0
        evaluate.last_test_batch = 50
    else:
        evaluate.first_test_batch = 50
        evaluate.last_test_batch = 100
    evaluate.use_seed = d["use_seed"]

    data = config.data
    data.dataset = d["dataset"]
    data.task = task
    data.scale = 8
    data.mask_coverage = 0.25
    data.datamodule = d["datamodule"]
    size = d["image_size"]
    data.target_resolution = size
    data.image_size = size
    data.effective_image_size = size
    ych = 1 if task == "colorization" else 3
    data.shape_x = [3, size, size]
    data.shape_y = [ych, size, size]
    data.use_flip = True
    data.use_crop = False
    data.use_rot = False
    data.upscale_lr = False
    data.num_channels = 3 + ych

    model = config.model
    model.num_scales = 1000
    model.sigma_max_x = float(np.sqrt(np.prod(data.shape_x)))
    model.sigma_min_x = 5e-3
    model.sigma_min_y = 5e-3
    model.sigma_min_y_target = 5e-3
    if approach == "song":
        model.sigma_max_y = model.sigma_max_x
    elif approach in ("ours_DV", "sr3"):
        # the anneal target tracks the task's CMDE sigma_max_y; i2i uses a
        # shorter 300k DV schedule (reference edges2shoes_ours_DV.py:101)
        model.sigma_max_y = float(np.sqrt(np.prod(data.shape_y)))
        model.sigma_max_y_target = d["sigma_max_y_ndv"]
        if approach == "ours_DV" and task == "image-to-image":
            model.reach_target_steps = 300000
        else:
            model.reach_target_steps = training.n_iters
        if approach == "sr3":
            model.sigma_min = model.sigma_min_x
            model.sigma_max = model.sigma_max_x
    else:
        model.sigma_max_y = d["sigma_max_y_ndv"]

    model.dropout = 0.1
    model.embedding_type = "positional"
    model.name = "ddpm_paired_SR3" if approach == "sr3" else "ddpm_paired"
    model.ema_rate = 0.999
    model.nf = d["nf"]
    model.ch_mult = tuple(d["ch_mult"])
    model.num_res_blocks = 2
    model.attn_resolutions = tuple(d["attn"])
    model.resamp_with_conv = True
    model.conditional = True
    model.fir = True
    model.fir_kernel = [1, 3, 3, 1]
    model.skip_rescale = True
    model.resblock_type = "biggan"
    model.progressive = "output_skip"
    model.progressive_input = "input_skip"
    model.progressive_combine = "sum"
    model.attention_type = "ddpm"
    model.init_scale = 0.0
    model.fourier_scale = 16
    model.conv_size = 3
    model.input_channels = data.num_channels
    model.output_channels = 3 if approach == "sr3" else data.num_channels

    config.optim.lr = 2e-4
    config.optim.warmup = 2500
    config.optim.grad_clip = 1.0
    return config


def i2i_interpolation_config(k: int | None = None, *, sr3: bool = False):
    """edges2shoes sigma_max_y interpolation sweep (reference
    `configs/ve/inverse_problems/image_to_image_translation/interpolation/
    {ours_NDV_1..9, SR3}.py`): point k sweeps
    sigma_max_y = 10^{(k-5)/2}, i.e. 10^-2 .. 10^2 in half-decade steps."""
    config = inverse_problem_config("image-to-image", "sr3" if sr3 else "ours_NDV")
    training = config.training
    training.batch_size = 80
    config.eval.draws = [1]
    config.eval.first_test_batch = 0
    config.eval.last_test_batch = 100

    model = config.model
    model.nf = 96
    model.ch_mult = (1, 1, 2, 2, 3)
    model.attn_resolutions = (16, 8, 4)
    if sr3:
        model.sigma_max_y_target = 0.1
        model.reach_target_steps = 500000
    else:
        training.conditioning_approach = f"ours_NDV_{k}"
        model.sigma_max_y = float(10.0 ** ((k - 5) / 2.0))
    return config


# inpainting interpolation sweep sigma_max_y grid (reference
# configs/ve/inverse_problems/inpainting/interpolation/c{1..10}.py)
INPAINTING_SWEEP = [5.1e-3, 1.671e-2, 5.474e-2, 1.793e-1, 5.875e-1,
                    1.925, 6.305, 2.066e1, 6.767e1, 2.217e2]


def inpainting_interpolation_config(k: int):
    """Inpainting sigma_max_y sweep point c{k}, k in 1..10."""
    config = inverse_problem_config("inpainting", "ours_NDV")
    training = config.training
    training.conditioning_approach = str(k)
    training.batch_size = 100
    training.n_iters = 356999

    evaluate = config.eval
    evaluate.draws = [1]
    evaluate.first_test_batch = 0
    evaluate.last_test_batch = 25
    evaluate.batch_size = training.batch_size

    config.model.sigma_max_y = INPAINTING_SWEEP[k - 1]
    return config
