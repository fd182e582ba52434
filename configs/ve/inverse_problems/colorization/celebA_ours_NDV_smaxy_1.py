"""Colorization CMDE with sigma_max_y = 1.

Mirrors `configs/ve/inverse_problems/colorization/celebA_ours_NDV_smaxy_1.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.inverse_problems import inverse_problem_config


def get_config():
    config = inverse_problem_config("colorization", "ours_NDV")
    config.model.sigma_max_y = 1
    return config
