"""NCSNv2 on bedroom, SMLD + annealed Langevin.

Mirrors `configs/ve/ncsnv2/bedroom.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import ncsnv2_config


def get_config():
    return ncsnv2_config("bedroom")
