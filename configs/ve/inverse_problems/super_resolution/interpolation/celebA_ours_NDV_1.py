"""sigma_max_y interpolation sweep point: sigma_max_y = 1 (CMDE)."""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_160_config


def get_config():
    config = celeba_sr_160_config("ours_NDV")
    config.model.sigma_max_y = 1
    return config
