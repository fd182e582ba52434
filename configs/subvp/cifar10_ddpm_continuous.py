"""CIFAR-10 with the sub-VP SDE (ddpm).

Mirrors `configs/subvp/cifar10_ddpm_continuous.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import (
    ddpm_block,
    ddpmpp_block,
    get_default_configs,
)


def get_config():
    config = get_default_configs("cifar10")
    config.training.sde = "subvpsde"
    config.training.continuous = True
    config.training.reduce_mean = True
    config.sampling.predictor = "euler_maruyama"
    config.sampling.corrector = "none"
    config.data.centered = True
    model = config.model
    ddpm_block(model)
    model.scale_by_sigma = False
    model.ema_rate = 0.9999
    return config
