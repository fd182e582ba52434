"""CelebA-HQ 128px super-resolution, ours_DV with sigma_max_y=1.0.

Mirrors `configs/ve/inverse_problems/super_resolution/celebA_ours_DV_smaxy_1.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_128_config


def get_config():
    return celeba_sr_128_config("ours_DV", smaxy=1.0)
