"""CelebA-HQ-160 SR, deep (nf=128) sr3 variant.

Mirrors `configs/ve/inverse_problems/super_resolution/deep_celebA_SR3.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_deep_config


def get_config():
    return celeba_sr_deep_config("sr3")
