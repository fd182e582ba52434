"""NCSNv1 on CIFAR10 (techniques 5), SMLD + annealed Langevin.

Mirrors `configs/ve/ncsn/cifar10_5.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.ncsn_legacy import ncsn_config


def get_config():
    return ncsn_config("cifar10", "5")
