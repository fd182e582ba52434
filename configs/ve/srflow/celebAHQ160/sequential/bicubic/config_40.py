"""celebA-HQ-160 sequential 2x SR stage at 40px in bicubic space.

Mirrors `configs/ve/srflow/celebAHQ160/sequential/bicubic/config_40.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import hq160_sequential_config


def get_config():
    return hq160_sequential_config(40, "bicubic")
