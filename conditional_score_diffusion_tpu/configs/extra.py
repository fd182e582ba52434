"""Remaining config families: MRI->PET, unconditional PKL, Haar multiscale,
VP/subVP CIFAR-10, VP toy.

Reference trees mirrored:
  * `configs/ve/inverse_problems/MRI_to_PET/{MRI_to_PET_slices,
    MRI_to_PET_slices3D, mri_to_pet_SR3}.py`
  * `configs/ve/unconditional/celebA-HQ-{64,128}.py`
  * `configs/ve/haarflow/128.py` (conditional Haar VS-CMDE) and the
    `haar_multiscale` unconditional path
  * `configs/{vp,subvp}/cifar10_*` and `configs/vp/SyntheticDataset.py`
"""

from __future__ import annotations

import math

import numpy as np

from .base import base_config, image_model_defaults


def mri_to_pet_config(volumetric: bool = False, approach: str = "ours_DV"):
    """MRI->PET paired scans (reference `MRI_to_PET_slices{,3D}.py`)."""
    config = base_config()
    training = config.training
    training.lightning_module = (
        "conditional_decreasing_variance" if approach == "ours_DV" else "conditional"
    )
    training.conditioning_approach = approach
    training.batch_size = 4 if volumetric else 32
    training.visualization_callback = "paired3D" if volumetric else "paired"
    training.sde = "vesde"

    sampling = config.sampling
    sampling.predictor = "conditional_reverse_diffusion"
    sampling.corrector = "conditional_langevin"

    data = config.data
    data.dataset = "mri_to_pet"
    data.task = "image-to-image"
    data.datamodule = "paired"
    size = 96
    data.image_size = size
    data.effective_image_size = size
    if volumetric:
        data.shape_x = [1, size, size, 16]
        data.shape_y = [1, size, size, 16]
    else:
        data.shape_x = [1, size, size]
        data.shape_y = [1, size, size]
    data.num_channels = 2
    data.use_flip = True
    # per-domain intensity ranges (normalise(), reference PairedDataset.py:12)
    data.range_y = (0.0, 255.0)
    data.range_x = (0.0, 255.0)

    model = config.model
    model.num_scales = 1000
    model.sigma_max_x = float(np.sqrt(np.prod(data.shape_x)))
    model.sigma_min_x = 5e-3
    model.sigma_min_y = 5e-3
    model.sigma_max_y = float(np.sqrt(np.prod(data.shape_y)))
    model.sigma_max_y_target = 1.0
    model.sigma_min_y_target = 5e-3
    model.reach_target_steps = training.n_iters
    model.name = (
        ("ddpm3D_paired_SR3" if approach == "sr3" else "ddpm3D_paired")
        if volumetric
        else ("ddpm_paired_SR3" if approach == "sr3" else "ddpm_paired")
    )
    image_model_defaults(model)
    model.nf = 32 if volumetric else 96
    model.ch_mult = (1, 2, 2) if volumetric else (1, 1, 2, 2, 3, 3)
    model.attn_resolutions = () if volumetric else (12, 6)
    model.input_channels = 2
    model.output_channels = 1 if approach == "sr3" else 2
    return config


def unconditional_pkl_config(image_size: int = 64):
    """Unconditional NCSN++ on celebA-HQ pklv4 (reference
    `configs/ve/unconditional/celebA-HQ-{64,128}.py`)."""
    config = base_config()
    config.experiment_name = f"ve_celebAHQ_{image_size}"
    config.training.lightning_module = "base"
    config.training.sde = "vesde"
    config.training.likelihood_weighting = False
    config.training.reduce_mean = False

    data = config.data
    data.dataset = "celebA-HQ-160"
    data.datamodule = "unpaired_PKLDataset"
    data.image_size = image_size
    data.effective_image_size = image_size
    data.shape = [3, image_size, image_size]
    data.num_channels = 3
    data.use_flip = True

    model = config.model
    model.sigma_max = float(np.sqrt(np.prod(data.shape)))
    model.sigma_min = 5e-3
    model.name = "ncsnpp"
    image_model_defaults(model)
    model.nf = 128
    model.ch_mult = (1, 1, 2, 2)
    model.attn_resolutions = (16,)
    model.num_scales = 1000
    return config


def haar_conditional_config(image_size: int = 128, target_resolution: int = 256):
    """Conditional Haar VS-CMDE: HF detail bands given the DC band
    (reference `configs/ve/haarflow/128.py`)."""
    config = base_config()
    training = config.training
    training.lightning_module = "haar_conditional_decreasing_variance"
    training.conditioning_approach = "ours_DV"
    training.batch_size = 32
    training.sde = "vesde"
    training.visualization_callback = "haar_multiscale"

    sampling = config.sampling
    sampling.predictor = "conditional_reverse_diffusion"
    sampling.corrector = "conditional_langevin"

    data = config.data
    data.dataset = "celebA-HQ-160"
    data.task = "multi_scale"
    data.datamodule = "Haar_PKLDataset"
    data.map = "approx to detail"
    data.image_size = image_size
    data.target_resolution = target_resolution
    data.level = int(math.log2(target_resolution // image_size))
    # after one haar level: spatial /2, detail bands 9ch + approx 3ch
    data.effective_image_size = image_size // 2
    data.shape_x = [9, image_size // 2, image_size // 2]  # HF details
    data.shape_y = [3, image_size // 2, image_size // 2]  # DC approx
    data.num_channels = 12
    data.use_flip = True
    data.use_crop = False
    data.use_rot = False
    data.max_haar_depth = 4

    model = config.model
    model.num_scales = 1000
    model.sigma_max_x = float(np.sqrt(np.prod(data.shape_x)))
    model.sigma_min_x = 5e-3
    model.sigma_min_y = 5e-3
    model.sigma_max_y = float(np.sqrt(np.prod(data.shape_y)))
    model.sigma_max_y_target = 1.0
    model.sigma_min_y_target = 5e-3
    model.reach_target_steps = training.n_iters
    # value range doubles per haar level (reference haarflow/128.py:94-99)
    model.name = "ddpm_paired"
    image_model_defaults(model)
    model.nf = 128
    model.ch_mult = (1, 1, 2, 2, 3, 3)
    model.attn_resolutions = (16, 8)
    model.input_channels = 12
    model.output_channels = 12
    return config


def haar_multiscale_unconditional_config(image_size: int = 64):
    """Unconditional generation in Haar space (reference
    `HaarMultiScaleSdeGenerativeModel` + `HaarDecomposedDataset`)."""
    config = base_config()
    config.training.lightning_module = "haar_multiscale"
    config.training.sde = "vesde"
    config.training.visualization_callback = "haar_multiscale"

    data = config.data
    data.dataset = "celebA"
    data.datamodule = "haar_multiscale"
    data.image_size = image_size
    data.level = 0
    data.effective_image_size = image_size // 2
    data.shape = [12, image_size // 2, image_size // 2]
    data.num_channels = 12

    model = config.model
    model.sigma_max = float(np.sqrt(np.prod(data.shape)))
    model.sigma_min = 5e-3
    model.name = "ddpm"
    image_model_defaults(model)
    model.nf = 128
    model.ch_mult = (1, 1, 2, 2)
    model.attn_resolutions = (16, 8)
    model.input_channels = 12
    model.output_channels = 12
    model.num_scales = 1000
    return config


def cifar10_vp_config(sde: str = "vpsde", model_name: str = "ncsnpp"):
    """CIFAR-10 with VP/subVP SDEs (reference `configs/{vp,subvp}/cifar10_*`)."""
    config = base_config()
    config.training.sde = sde
    config.training.continuous = True
    config.training.likelihood_weighting = sde == "subvpsde"
    config.training.reduce_mean = True
    config.sampling.method = "pc"
    config.sampling.predictor = "euler_maruyama"
    config.sampling.corrector = "none"
    config.sampling.snr = 0.16

    data = config.data
    data.dataset = "CIFAR10"
    data.datamodule = "image"
    data.image_size = 32
    data.effective_image_size = 32
    data.centered = True
    data.shape = [3, 32, 32]
    data.num_channels = 3

    model = config.model
    model.name = model_name
    image_model_defaults(model)
    model.nf = 128
    model.ch_mult = (1, 2, 2, 2)
    model.num_res_blocks = 4
    model.attn_resolutions = (16,)
    model.embedding_type = "positional"
    model.fir = False
    model.resblock_type = "biggan"
    model.num_scales = 1000
    model.beta_min = 0.1
    model.beta_max = 20.0
    config.optim.warmup = 5000
    return config


def toy_vp_config():
    """2-D GaussianBubbles with a VP SDE (reference `configs/vp/SyntheticDataset.py`)."""
    from .base import base_config

    config = base_config()
    config.training.sde = "vpsde"
    config.training.batch_size = 256
    config.data.datamodule = "Synthetic"
    config.data.dataset = "Synthetic"
    config.data.dataset_type = "GaussianBubbles"
    config.data.data_samples = 100000
    config.data.mixtures = 4
    config.data.return_mixtures = False
    config.data.shape = [2]
    config.model.name = "fcn"
    config.model.state_size = 2
    config.model.hidden_layers = 2
    config.model.hidden_nodes = 128
    config.model.dropout = 0.0
    config.model.num_scales = 500
    config.optim.lr = 1e-3
    return config


def synthetic_config(sde: str = "vesde"):
    """2-D GaussianBubbles toy, reference hyperparameters (reference
    `configs/ve/SyntheticDataset.py` / `configs/vp/SyntheticDataset.py`:
    batch 500, FCN 3x64, dropout 0.25, 1000 scales, ema 0.9999)."""
    config = base_config()
    training = config.training
    training.sde = sde
    training.batch_size = 500
    training.workers = 4
    training.num_epochs = 10000
    training.n_iters = 500000
    training.snapshot_freq = 5000
    training.log_freq = 50
    training.eval_freq = 2500
    training.likelihood_weighting = False
    training.continuous = True
    training.reduce_mean = False
    training.visualization_callback = "2D"

    sampling = config.sampling
    sampling.method = "pc"
    sampling.predictor = "reverse_diffusion"
    sampling.corrector = "none"
    sampling.snr = 0.075

    config.validation.batch_size = 500
    config.eval.batch_size = 512

    data = config.data
    data.datamodule = "Synthetic"
    data.dataset = "Synthetic"
    data.dataset_type = "GaussianBubbles"
    data.data_samples = 50000
    data.mixtures = 4
    data.return_mixtures = False
    data.shape = [2]
    data.dim = 2
    data.num_channels = 0

    model = config.model
    model.sigma_max = 4 if sde == "vesde" else 378
    model.sigma_min = 0.01
    model.beta_min = 0.1
    model.beta_max = 25 if sde == "vesde" else 20
    model.name = "fcn"
    model.state_size = 2
    model.hidden_layers = 3
    model.hidden_nodes = 64
    model.dropout = 0.25
    model.scale_by_sigma = False
    model.num_scales = 1000
    model.ema_rate = 0.9999

    optim = config.optim
    optim.lr = 2e-5 if sde == "vesde" else 1e-4
    optim.warmup = 5000
    return config


def haarflow_config(image_size: int = 128, sde: str = "vesde"):
    """Unconditional-in-Haar-space DDPM on celebaHQ (reference
    `configs/ve/haarflow/128.py` and `configs/vp/haarflow/celebahq.py`).
    The reference files carry no datamodule key; this builder wires the
    `haar_multiscale` datamodule so the recipe trains."""
    ve = sde == "vesde"
    config = base_config()
    training = config.training
    training.sde = sde
    training.lightning_module = (
        "conditional_decreasing_variance" if ve else "base"
    )
    training.batch_size = 32 if ve else 64
    training.n_iters = 2400001
    training.log_freq = 250 if ve else 50
    training.likelihood_weighting = ve
    training.continuous = not ve
    training.reduce_mean = ve
    training.visualization_callback = "haar_multiscale"

    sampling = config.sampling
    sampling.predictor = "conditional_reverse_diffusion" if ve else "reverse_diffusion"
    sampling.corrector = "conditional_langevin" if ve else "langevin"
    sampling.snr = 0.16 if ve else 0.075

    config.eval.batch_size = 36 if ve else 512

    data = config.data
    data.dataset = "celebaHQ"
    data.datamodule = "haar_multiscale"
    data.highest_resolution = 1024
    data.target_resolution = image_size
    data.image_size = image_size
    data.level = math.log(data.target_resolution // data.image_size, 2)
    data.effective_image_size = image_size // 2
    data.max_haar_depth = 4 if ve else 3
    data.num_channels = 12
    data.shape = [12, image_size // 2, image_size // 2]
    data.shape_x = [9, image_size // 2, image_size // 2]
    data.shape_y = [3, image_size // 2, image_size // 2]

    model = config.model
    model.num_scales = 1000
    model.sigma_max = 320 if ve else 378
    model.sigma_min = 0.01
    model.sigma_max_x = model.sigma_max
    model.sigma_max_y = model.sigma_max
    model.sigma_max_y_target = 1.0
    model.sigma_min_x = 0.01
    model.sigma_min_y = 0.01
    model.sigma_min_y_target = 0.01
    model.reach_target_steps = 250000
    model.beta_min = 0.1
    model.beta_max = (20.0 + 4 * (data.level + 1) * np.log(2)) if ve else 20.0
    model.dropout = 0.1 if ve else 0.0
    model.embedding_type = "fourier"
    model.name = "ddpm"
    model.scale_by_sigma = ve
    model.ema_rate = 0.999 if ve else 0.9999
    model.normalization = "GroupNorm"
    model.nonlinearity = "swish"
    model.nf = 128
    model.ch_mult = (1, 1, 2, 2, 3, 3) if ve else (1, 1, 2, 2, 4, 4)
    model.num_res_blocks = 2
    model.attn_resolutions = (16, 8, 4) if ve else (16,)
    model.resamp_with_conv = True
    model.conditional = True
    model.conv_size = 3
    model.input_channels = 12
    model.output_channels = 12

    config.optim.lr = 2e-4 if ve else 2e-5
    config.optim.warmup = 5000
    return config
