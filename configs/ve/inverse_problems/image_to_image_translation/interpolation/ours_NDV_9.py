"""edges2shoes sigma_max_y sweep point 9 (CMDE).

Mirrors `configs/ve/inverse_problems/image_to_image_translation/interpolation/
ours_NDV_9.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.inverse_problems import i2i_interpolation_config


def get_config():
    return i2i_interpolation_config(9)
