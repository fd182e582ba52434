"""NCSN++ on LSUN-church 256, continuous VE SDE.

Mirrors `configs/ve/church_ncsnpp_continuous.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import get_default_configs, ncsnpp_lsun_block


def get_config():
    config = get_default_configs("lsun")
    config.training.sde = "vesde"
    config.training.continuous = True
    config.data.category = "church_outdoor"
    ncsnpp_lsun_block(config.model)
    config.model.sigma_max = 380.0
    return config
