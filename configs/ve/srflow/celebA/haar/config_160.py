"""SRFlow-benchmark celebA Haar multiscale stage at 160px.

Mirrors `configs/ve/srflow/celebA/haar/config_160.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import celeba_haar_config


def get_config():
    return celeba_haar_config(160)
