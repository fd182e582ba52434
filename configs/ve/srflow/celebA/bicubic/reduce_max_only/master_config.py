"""Master config chaining the celebA bicubic multiscale scales.

Mirrors `configs/ve/srflow/celebA/bicubic/reduce_max_only/master_config.py` in the reference (whose own import path is
stale; this mirror imports the actual per-scale builders).
"""

import ml_collections

from conditional_score_diffusion_tpu.configs.srflow import celeba_bicubic_config


def get_config():
    config = ml_collections.ConfigDict()
    config.config_40 = celeba_bicubic_config(40)
    config.config_80 = celeba_bicubic_config(80)
    config.config_160 = celeba_bicubic_config(160)
    return config
