"""Master config for the inpainting sigma_max_y sweep.

Mirrors `configs/ve/inverse_problems/inpainting/interpolation/master_config.py`
in the reference.
"""

import ml_collections

from conditional_score_diffusion_tpu.configs.inverse_problems import (
    inpainting_interpolation_config,
)


def get_config():
    config = ml_collections.ConfigDict()
    for k in range(1, 11):
        config[f"c{k}"] = inpainting_interpolation_config(k)
    return config
