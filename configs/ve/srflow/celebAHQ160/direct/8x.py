"""celebA-HQ-160 direct 8x SR with DDPM-KxSR.

Mirrors `configs/ve/srflow/celebAHQ160/direct/8x.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import hq160_direct_8x_config


def get_config():
    return hq160_direct_8x_config()
