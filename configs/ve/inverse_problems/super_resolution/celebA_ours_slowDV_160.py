"""CelebA-HQ-160 SR, slow-anneal VS-CMDE variant.

Mirrors `configs/ve/inverse_problems/super_resolution/celebA_ours_slowDV_160.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_160_config


def get_config():
    return celeba_sr_160_config("ours_slowDV")
