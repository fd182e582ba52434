"""CelebA-64 architecture-comparison sweep: ddpm.

Mirrors `configs/ve/jan/ddpm/celeba_64.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import jan_celeba64_config


def get_config():
    return jan_celeba64_config("ddpm")
