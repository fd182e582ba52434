"""MRI->PET 2D slices, SR3/CDE estimator."""

from conditional_score_diffusion_tpu.configs.extra import mri_to_pet_config


def get_config():
    return mri_to_pet_config(volumetric=False, approach="sr3")
