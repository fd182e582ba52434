"""Unconditional NCSN++ on celebA-HQ 128px pklv4."""

from conditional_score_diffusion_tpu.configs.extra import unconditional_pkl_config


def get_config():
    return unconditional_pkl_config(128)
