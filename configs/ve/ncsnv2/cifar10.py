"""NCSNv2 on cifar10, SMLD + annealed Langevin.

Mirrors `configs/ve/ncsnv2/cifar10.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import ncsnv2_config


def get_config():
    return ncsnv2_config("cifar10")
