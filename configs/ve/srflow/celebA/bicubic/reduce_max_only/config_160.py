"""SRFlow-benchmark celebA bicubic multiscale stage at 160px (reduce max only).

Mirrors `configs/ve/srflow/celebA/bicubic/reduce_max_only/config_160.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import celeba_bicubic_config


def get_config():
    return celeba_bicubic_config(160)
