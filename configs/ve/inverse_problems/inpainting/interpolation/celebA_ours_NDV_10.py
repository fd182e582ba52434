"""sigma_max_y interpolation sweep point: sigma_max_y = 10 (CMDE)."""

from conditional_score_diffusion_tpu.configs.inverse_problems import inverse_problem_config


def get_config():
    config = inverse_problem_config("inpainting", "ours_NDV")
    config.model.sigma_max_y = 10
    return config
