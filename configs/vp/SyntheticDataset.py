"""2-D GaussianBubbles toy with the VP SDE.

Mirrors `configs/vp/SyntheticDataset.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.extra import synthetic_config


def get_config():
    return synthetic_config(sde="vpsde")
