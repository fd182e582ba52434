"""CIFAR-10 NCSN++, sub-VP SDE, continuous."""

from conditional_score_diffusion_tpu.configs.extra import cifar10_vp_config


def get_config():
    return cifar10_vp_config('subvpsde')
