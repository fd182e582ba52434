"""Master config chaining the celebA-HQ-160 sequential bicubic scales.

Mirrors `configs/ve/srflow/celebAHQ160/sequential/bicubic/master_config.py` in the reference (whose own import path is
stale; this mirror imports the actual per-scale builders).
"""

import ml_collections

from conditional_score_diffusion_tpu.configs.srflow import hq160_sequential_config


def get_config():
    config = ml_collections.ConfigDict()
    config.config_40 = hq160_sequential_config(40, "bicubic")
    config.config_80 = hq160_sequential_config(80, "bicubic")
    config.config_160 = hq160_sequential_config(160, "bicubic")
    return config
