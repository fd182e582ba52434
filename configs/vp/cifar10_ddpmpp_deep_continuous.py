"""Deep DDPM++ on CIFAR-10, continuous VP SDE.

Mirrors `configs/vp/cifar10_ddpmpp_deep_continuous.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import ddpmpp_block, get_default_configs


def get_config():
    config = get_default_configs("cifar10")
    config.training.sde = "vpsde"
    config.training.continuous = True
    config.training.reduce_mean = True
    config.training.n_iters = 950001
    config.sampling.predictor = "euler_maruyama"
    config.sampling.corrector = "none"
    config.data.centered = True
    ddpmpp_block(config.model, deep=True)
    return config
