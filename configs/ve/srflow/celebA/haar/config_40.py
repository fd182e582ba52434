"""SRFlow-benchmark celebA Haar multiscale stage at 40px.

Mirrors `configs/ve/srflow/celebA/haar/config_40.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import celeba_haar_config


def get_config():
    return celeba_haar_config(40)
