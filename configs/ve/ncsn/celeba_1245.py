"""NCSNv1 on CELEBA (techniques 1245), SMLD + annealed Langevin.

Mirrors `configs/ve/ncsn/celeba_1245.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import ncsn_config


def get_config():
    return ncsn_config("celeba", "1245")
