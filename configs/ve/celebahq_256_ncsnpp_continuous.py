"""NCSN++ on CelebA-HQ 256, continuous VE SDE.

Mirrors `configs/ve/celebahq_256_ncsnpp_continuous.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import get_default_configs, ncsnpp_lsun_block


def get_config():
    config = get_default_configs("lsun")
    config.training.sde = "vesde"
    config.training.continuous = True
    data = config.data
    data.dataset = "CelebAHQ"
    data.image_size = 256
    data.effective_image_size = 256
    data.shape = [3, 256, 256]
    ncsnpp_lsun_block(config.model)
    config.model.sigma_max = 348.0
    return config
