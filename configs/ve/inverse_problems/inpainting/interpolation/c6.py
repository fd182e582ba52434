"""Inpainting sigma_max_y sweep point c6.

Mirrors `configs/ve/inverse_problems/inpainting/interpolation/c6.py` in the
reference.
"""

from conditional_score_diffusion_tpu.configs.inverse_problems import inpainting_interpolation_config


def get_config():
    return inpainting_interpolation_config(6)
