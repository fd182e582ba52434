"""2-D GaussianBubbles toy with the VE SDE.

Mirrors `configs/ve/SyntheticDataset.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.extra import synthetic_config


def get_config():
    return synthetic_config(sde="vesde")
