"""Unconditional NCSN++ on celebA-HQ pklv4 at 64px, VE SDE.

Mirrors `configs/ve/unconditional/celebA-HQ-64.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.extra import unconditional_pkl_config


def get_config():
    return unconditional_pkl_config(64)
