"""edges2shoes interpolation baseline: SR3 (CDE).

Mirrors `configs/ve/inverse_problems/image_to_image_translation/interpolation/SR3.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.inverse_problems import i2i_interpolation_config


def get_config():
    return i2i_interpolation_config(sr3=True)
