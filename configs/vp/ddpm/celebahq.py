"""DDPM on CelebAHQ, VP SDE.

Mirrors `configs/vp/ddpm/celebahq.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.song import ddpm_block, get_default_configs


def get_config():
    config = get_default_configs("lsun")
    config.training.sde = "vpsde"
    config.training.continuous = False
    config.training.reduce_mean = True
    config.sampling.predictor = "ancestral_sampling"
    config.sampling.corrector = "none"
    data = config.data
    data.centered = True
    data.dataset = "CelebAHQ"
    data.image_size = 256
    data.effective_image_size = 256
    data.shape = [3, 256, 256]
    model = config.model
    ddpm_block(model)
    model.scale_by_sigma = False
    model.ema_rate = 0.9999
    model.num_scales = 1000
    model.ch_mult = (1, 1, 2, 2, 4, 4)
    config.optim.lr = 2e-5
    return config
