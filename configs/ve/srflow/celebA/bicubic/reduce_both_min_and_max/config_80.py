"""SRFlow-benchmark celebA bicubic stage at 80px, annealing both sigma bounds.

Mirrors `configs/ve/srflow/celebA/bicubic/reduce_both_min_and_max/config_80.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import celeba_bicubic_config


def get_config():
    return celeba_bicubic_config(80, reduce_both=True)
