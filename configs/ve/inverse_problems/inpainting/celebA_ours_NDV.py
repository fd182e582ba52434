"""inpainting task, ours_NDV estimator (path mirrors the reference config tree)."""

from conditional_score_diffusion_tpu.configs.inverse_problems import inverse_problem_config


def get_config():
    return inverse_problem_config("inpainting", "ours_NDV")
