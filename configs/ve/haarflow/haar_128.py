"""Conditional Haar VS-CMDE: HF bands given DC (haarflow 128)."""

from conditional_score_diffusion_tpu.configs.extra import haar_conditional_config


def get_config():
    return haar_conditional_config(128, 256)
