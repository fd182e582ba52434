"""Conditional VS-CMDE DDPM in Haar space on celebaHQ-128, VE SDE.

Mirrors `configs/ve/haarflow/128.py` in the reference (which carries no
datamodule key; this mirror wires the `haar_multiscale` datamodule so the
recipe actually trains).
"""

from conditional_score_diffusion_tpu.configs.extra import haarflow_config


def get_config():
    return haarflow_config(image_size=128, sde="vesde")
