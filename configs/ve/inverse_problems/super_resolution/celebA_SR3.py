"""CelebA-HQ 128px super-resolution, sr3.

Mirrors `configs/ve/inverse_problems/super_resolution/celebA_SR3.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_128_config


def get_config():
    return celeba_sr_128_config("sr3")
