"""Unconditional DDPM in Haar space on celebaHQ-64, VP SDE.

Mirrors `configs/vp/haarflow/celebahq.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.extra import haarflow_config


def get_config():
    config = haarflow_config(image_size=64, sde="vpsde")
    return config
