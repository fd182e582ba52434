"""2-D GaussianBubbles toy with the VP SDE, higher learning rate (2e-5 vs 1e-4).

Mirrors `configs/vp/SyntheticDataset_higher_lr.py` in the reference (which
is the `beta_max=25, lr=2e-5` variant of `configs/vp/SyntheticDataset.py`).
"""

from conditional_score_diffusion_tpu.configs.extra import synthetic_config


def get_config():
    config = synthetic_config(sde="vpsde")
    config.model.beta_max = 25
    config.optim.lr = 2e-5
    return config
