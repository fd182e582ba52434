"""Per-scale configs for a REAL trained Haar multi-scale pyramid on texture64
(VERDICT round-2 item 5).

Two VS-CMDE detail-prediction scales in the reference's sequential-haar
style (`configs/ve/srflow/celebAHQ160/sequential/haar/config_*.py`,
mirrored by `conditional_score_diffusion_tpu/configs/srflow.py:
hq160_sequential_config`), shrunk to the locally-buildable texture64
dataset and short on-TPU schedules:

  * scale 32: model works at 16px — y = 16px DC band (2-level Haar),
    x = 9ch HF detail; inverse Haar -> 32px image.
  * scale 64: model works at 32px — y = 32px DC band (1-level Haar),
    x = 9ch HF detail; inverse Haar -> the final 64px image.

`get_config(size)` returns one scale; `configs/artifacts/
texture64_multiscale_master.py` aggregates both for
`--mode multi_scale_test`.
"""

from __future__ import annotations

import math

import ml_collections
import numpy as np

from conditional_score_diffusion_tpu.configs.base import base_config


def scale_config(image_size: int) -> ml_collections.ConfigDict:
    """image_size in {32, 64}: the scale's OUTPUT resolution."""
    config = base_config()
    training = config.training
    training.batch_size = 64
    training.n_iters = 8001
    training.log_freq = 200
    training.eval_freq = 2000
    training.snapshot_freq = 2000
    training.visualization_freq = 4000
    training.likelihood_weighting = True
    training.continuous = True
    training.reduce_mean = True
    training.sde = "vesde"
    training.lightning_module = "haar_conditional_decreasing_variance"
    training.visualization_callback = "conditional_haar_multiscale"
    training.conditioning_approach = "ours_DV"

    sampling = config.sampling
    sampling.predictor = "conditional_reverse_diffusion"
    sampling.corrector = "conditional_langevin"
    sampling.snr = 0.16

    config.eval.batch_size = 8
    config.eval.max_val_batches = 2
    config.optim.warmup = 500
    config.optim.lr = 2e-4
    config.optim.grad_clip = 1.0

    data = config.data
    data.datamodule = "Haar_PKLDataset"
    data.dataset = "texture64"
    data.base_dir = "datasets"
    data.map = "approx to detail"
    data.target_resolution = 64
    data.image_size = image_size
    data.effective_image_size = image_size // 2
    data.scale = 2
    data.use_flip = True
    data.use_crop = False
    data.use_rot = False
    data.level = int(math.log(data.target_resolution // data.image_size, 2))
    data.range_x = [-(2**data.level), 2**data.level]
    data.range_y = [0, 2 ** (data.level + 1)]
    half = image_size // 2
    data.shape_x = [9, half, half]
    data.shape_y = [3, half, half]
    data.num_channels = 12

    model = config.model
    model.name = "ddpm_paired"
    model.num_scales = 1000
    model.sigma_min_x = 5e-3
    model.sigma_min_y = 5e-3
    model.sigma_min_y_target = 5e-3
    model.sigma_max_x = float(
        np.sqrt(np.prod(data.shape_x)) * (data.range_x[1] - data.range_x[0])
    )
    model.sigma_max_y = float(
        np.sqrt(np.prod(data.shape_y)) * (data.range_y[1] - data.range_y[0])
    )
    model.sigma_max_y_target = model.sigma_max_y / 2
    model.reach_target_steps = 4000
    model.ema_rate = 0.999
    model.dropout = 0.1
    model.embedding_type = "positional"
    model.nf = 48
    model.ch_mult = (1, 2) if image_size == 32 else (1, 1, 2)
    model.num_res_blocks = 2
    model.attn_resolutions = (8,)
    model.resamp_with_conv = True
    model.conditional = True
    model.scale_by_sigma = True
    model.input_channels = data.num_channels
    model.output_channels = data.num_channels

    config.logging = ml_collections.ConfigDict()
    config.logging.log_path = f"artifacts/texture64_pyramid/scale_{image_size}"
    model.checkpoint_path = (
        f"artifacts/texture64_pyramid/scale_{image_size}/texture64/checkpoints"
    )
    return config


def get_config(size: str = "64"):
    return scale_config(int(size))
