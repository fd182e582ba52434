"""DF2K sequential 2x SR stage 40to80.

Mirrors `configs/ve/srflow/DF2K/sequential/40to80.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import df2k_config


def get_config():
    return df2k_config("40to80")
