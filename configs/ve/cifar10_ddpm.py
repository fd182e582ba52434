"""Original DDPM U-Net trained with SMLD on CIFAR-10.

Mirrors `configs/ve/cifar10_ddpm.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import ddpm_block, get_default_configs


def get_config():
    config = get_default_configs("cifar10")
    config.training.sde = "vesde"
    config.training.continuous = False
    ddpm_block(config.model)
    return config
