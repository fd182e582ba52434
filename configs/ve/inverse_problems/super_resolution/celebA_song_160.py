"""CelebA-HQ-160 SR, song estimator (path mirrors the reference config tree)."""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_160_config


def get_config():
    return celeba_sr_160_config("song")
