"""MRI->PET SR3 (CDE) with the VP SDE.

Mirrors `configs/vp/inverse_problems/MRI_to_PET/mri_to_pet_SR3.py` in the
reference (identical to the VE recipe apart from the SDE).
"""

from conditional_score_diffusion_tpu.configs.extra import mri_to_pet_config


def get_config():
    config = mri_to_pet_config(volumetric=False, approach="sr3")
    config.experiment_name = "vp_da"
    config.training.sde = "vpsde"
    return config
