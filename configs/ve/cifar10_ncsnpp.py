"""NCSN++ on CIFAR-10 with SMLD (discrete VE).

Mirrors `configs/ve/cifar10_ncsnpp.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import get_default_configs, ncsnpp_block


def get_config():
    config = get_default_configs("cifar10")
    config.training.sde = "vesde"
    config.training.continuous = False
    ncsnpp_block(config.model)
    config.model.embedding_type = "positional"
    return config
