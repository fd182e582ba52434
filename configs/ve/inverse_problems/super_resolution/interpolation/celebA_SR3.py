"""64px SR interpolation baseline: SR3 (CDE).

Mirrors `configs/ve/inverse_problems/super_resolution/interpolation/celebA_SR3.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_interpolation_config


def get_config():
    return celeba_sr_interpolation_config("sr3")
