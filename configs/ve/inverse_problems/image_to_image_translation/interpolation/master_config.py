"""Master config for the edges2shoes sigma_max_y sweep.

Mirrors `configs/ve/inverse_problems/image_to_image_translation/interpolation/
master_config.py` in the reference.
"""

import ml_collections

from conditional_score_diffusion_tpu.configs.inverse_problems import i2i_interpolation_config


def get_config():
    config = ml_collections.ConfigDict()
    for k in range(1, 10):
        config[f"ours_DV_{k}"] = i2i_interpolation_config(k)
    config.SR3 = i2i_interpolation_config(sr3=True)
    return config
