"""celebA-HQ-160 sequential 2x SR stage at 80px in haar space.

Mirrors `configs/ve/srflow/celebAHQ160/sequential/haar/config_80.py`
in the reference.
"""

from conditional_score_diffusion_tpu.configs.srflow import hq160_sequential_config


def get_config():
    return hq160_sequential_config(80, "haar")
