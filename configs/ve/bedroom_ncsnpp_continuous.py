"""NCSN++ on LSUN-bedroom 256, continuous VE SDE.

Mirrors `configs/ve/bedroom_ncsnpp_continuous.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import get_default_configs, ncsnpp_lsun_block


def get_config():
    config = get_default_configs("lsun")
    config.training.sde = "vesde"
    config.training.continuous = True
    config.data.category = "bedroom"
    ncsnpp_lsun_block(config.model)
    return config
