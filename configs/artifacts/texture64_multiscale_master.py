"""Master config for the trained texture64 Haar pyramid
(`--mode multi_scale_test`, reference `run_lib.py:113-332`).

Chains the two trained VS-CMDE detail-prediction scales from
`configs/artifacts/texture64_haar_scales.py`: 16px DC -> 32px -> 64px.
"""

import ml_collections

from configs.artifacts.texture64_haar_scales import scale_config


def get_config():
    config = ml_collections.ConfigDict()
    config.coordinate_space = "haar"
    config.scale_32 = scale_config(32)
    config.scale_64 = scale_config(64)
    return config
