"""DDPM++ on CIFAR-10, discrete VP (ancestral sampling).

Mirrors `configs/vp/cifar10_ddpmpp.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import ddpmpp_block, get_default_configs


def get_config():
    config = get_default_configs("cifar10")
    config.training.sde = "vpsde"
    config.training.continuous = False
    config.training.reduce_mean = True
    config.sampling.predictor = "ancestral_sampling"
    config.sampling.corrector = "none"
    config.data.centered = True
    ddpmpp_block(config.model)
    return config
