"""64px SR sigma_max_y sweep point 8 (CMDE).

Mirrors `configs/ve/inverse_problems/super_resolution/interpolation/
celebA_ours_NDV_8.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_interpolation_config

_LOG10 = {1: -1.0, 2: -0.5, 3: 0.0, 4: 0.5, 5: 1.0, 6: 1.5, 7: 2.0, 8: -1.5, 9: -2.0}


def get_config():
    return celeba_sr_interpolation_config("ours_NDV", smaxy_log10=_LOG10[8])
