"""Unconditional NCSN++ on celebA-HQ pklv4 at 128px, VE SDE.

Mirrors `configs/ve/unconditional/celebA-HQ-128.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.extra import unconditional_pkl_config


def get_config():
    return unconditional_pkl_config(128)
