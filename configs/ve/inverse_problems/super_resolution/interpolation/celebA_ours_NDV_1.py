"""64px SR sigma_max_y sweep point 1 (CMDE).

Mirrors `configs/ve/inverse_problems/super_resolution/interpolation/
celebA_ours_NDV_1.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_interpolation_config


def get_config():
    return celeba_sr_interpolation_config("ours_NDV", smaxy_log10=-1.0)
