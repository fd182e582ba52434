"""2-D two-moons toy with the VP SDE.

Mirrors `configs/vp/toy_moons.py` in the reference (which carries the
recipe but no datamodule keys; this mirror wires it to the Synthetic
datamodule's `Moons` generator so it actually trains).
"""

from conditional_score_diffusion_tpu.configs.extra import synthetic_config


def get_config():
    config = synthetic_config(sde="vpsde")
    config.training.num_epochs = 10
    config.training.n_iters = 10000
    config.data.dataset_type = "Moons"
    config.data.noise_scale = 0.015
    config.model.sigma_max = 378
    config.model.beta_max = 25
    config.optim.lr = 2e-5
    return config
