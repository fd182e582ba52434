"""CelebA-64 architecture-comparison sweep: ncsnv2.

Mirrors `configs/ve/jan/ncsnv2/celeba_64.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import jan_celeba64_config


def get_config():
    return jan_celeba64_config("ncsnv2")
