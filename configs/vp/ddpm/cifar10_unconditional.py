"""DDPM on CIFAR-10, VP SDE.

Mirrors `configs/vp/ddpm/cifar10_unconditional.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import ddpm_block, get_default_configs


def get_config():
    config = get_default_configs("cifar10")
    config.training.sde = "vpsde"
    config.training.continuous = False
    config.training.reduce_mean = True
    config.sampling.predictor = "ancestral_sampling"
    config.sampling.corrector = "none"
    data = config.data
    data.centered = True
    model = config.model
    ddpm_block(model)
    model.scale_by_sigma = False
    model.ema_rate = 0.9999
    model.conditional = False
    return config
