"""Master config aggregating the inpainting estimators."""

import ml_collections

from conditional_score_diffusion_tpu.configs.inverse_problems import inverse_problem_config


def get_config():
    config = ml_collections.ConfigDict()
    for name, approach in [("ours_NDV", "ours_NDV"), ("ours_DV", "ours_DV"),
                           ("song", "song"), ("SR3", "sr3")]:
        config[name] = inverse_problem_config("inpainting", approach)
    return config
