"""NCSNv1 on CELEBA, SMLD + annealed Langevin.

Mirrors `configs/ve/ncsn/celeba.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import ncsn_config


def get_config():
    return ncsn_config("celeba", "v1")
