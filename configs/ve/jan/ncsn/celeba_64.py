"""CelebA-64 architecture-comparison sweep: ncsn.

Mirrors `configs/ve/jan/ncsn/celeba_64.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import jan_celeba64_config


def get_config():
    return jan_celeba64_config("ncsn")
