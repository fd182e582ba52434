"""2-D GaussianBubbles toy with VP SDE."""

from conditional_score_diffusion_tpu.configs.extra import toy_vp_config


def get_config():
    return toy_vp_config()
