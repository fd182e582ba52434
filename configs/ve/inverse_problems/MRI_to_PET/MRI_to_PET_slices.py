"""MRI->PET 2D slices, VS-CMDE (mirrors the reference path)."""

from conditional_score_diffusion_tpu.configs.extra import mri_to_pet_config


def get_config():
    return mri_to_pet_config(volumetric=False)
