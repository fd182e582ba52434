"""Inpainting CMDE, short-schedule variant (n_iters 250k).

Mirrors `configs/ve/inverse_problems/inpainting/celebA_ours_NDV_smaxy_1.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.inverse_problems import inverse_problem_config


def get_config():
    config = inverse_problem_config("inpainting", "ours_NDV")
    config.training.n_iters = 250000
    config.model.sigma_max_y = 1
    return config
