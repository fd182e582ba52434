"""Unconditional generation in Haar coefficient space."""

from conditional_score_diffusion_tpu.configs.extra import haar_multiscale_unconditional_config


def get_config():
    return haar_multiscale_unconditional_config(64)
