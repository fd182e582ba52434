"""NCSNv1 on CELEBA (techniques 124), SMLD + annealed Langevin.

Mirrors `configs/ve/ncsn/celeba_124.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import ncsn_config


def get_config():
    return ncsn_config("celeba", "124")
