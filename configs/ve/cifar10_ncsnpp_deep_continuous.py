"""Deep NCSN++ (8 resblocks) on CIFAR-10, continuous VE SDE.

Mirrors `configs/ve/cifar10_ncsnpp_deep_continuous.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import get_default_configs, ncsnpp_block


def get_config():
    config = get_default_configs("cifar10")
    config.training.sde = "vesde"
    config.training.continuous = True
    config.training.n_iters = 950001
    ncsnpp_block(config.model, deep=True)
    return config
