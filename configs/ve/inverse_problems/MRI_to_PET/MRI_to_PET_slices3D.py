"""MRI->PET 3D volumes, VS-CMDE (ddpm3D_paired)."""

from conditional_score_diffusion_tpu.configs.extra import mri_to_pet_config


def get_config():
    return mri_to_pet_config(volumetric=True)
