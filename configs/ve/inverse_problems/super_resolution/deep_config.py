"""Master config for the deep SR variants.

Mirrors `configs/ve/inverse_problems/super_resolution/deep_config.py` in the
reference.
"""

import ml_collections

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_deep_config


def get_config():
    config = ml_collections.ConfigDict()
    config.ours_NDV = celeba_sr_deep_config("ours_NDV")
    return config
