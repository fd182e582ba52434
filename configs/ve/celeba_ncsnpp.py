"""NCSN++ on CelebA-64 with SMLD.

Mirrors `configs/ve/celeba_ncsnpp.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import get_default_configs, ncsnpp_block


def get_config():
    config = get_default_configs("celeba")
    config.training.sde = "vesde"
    config.training.continuous = False
    ncsnpp_block(config.model)
    config.model.sigma_begin = 90
    config.model.embedding_type = "positional"
    return config
