"""NCSN++ on CelebA-HQ 1024, continuous VE SDE.

Mirrors `configs/ve/celebahq_ncsnpp_continuous.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import ffhq_1024_config


def get_config():
    return ffhq_1024_config("CelebAHQ")
