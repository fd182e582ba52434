"""DF2K direct 4x SR with NCSN++-KxSR.

Mirrors `configs/ve/srflow/DF2K/direct/4x.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import df2k_config


def get_config():
    return df2k_config("direct")
