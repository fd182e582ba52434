"""Master config aggregating the CelebA-160 SR estimators
(reference `configs/ve/inverse_problems/super_resolution/master_config.py`)."""

import ml_collections

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_160_config


def get_config():
    config = ml_collections.ConfigDict()
    config.ours_DV = celeba_sr_160_config("ours_DV")
    config.ours_NDV = celeba_sr_160_config("ours_NDV")
    config.song = celeba_sr_160_config("song")
    config.SR3 = celeba_sr_160_config("sr3")
    return config
