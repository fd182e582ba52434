"""Master config chaining the celebA haar multiscale scales.

Mirrors `configs/ve/srflow/celebA/haar/master_config.py` in the reference (whose own import path is
stale; this mirror imports the actual per-scale builders).
"""

import ml_collections

from conditional_score_diffusion_tpu.configs.srflow import celeba_haar_config


def get_config():
    config = ml_collections.ConfigDict()
    config.config_80 = celeba_haar_config(80)
    config.config_160 = celeba_haar_config(160)
    return config
