"""DF2K sequential 2x SR stage 80to160.

Mirrors `configs/ve/srflow/DF2K/sequential/80to160.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import df2k_config


def get_config():
    return df2k_config("80to160")
