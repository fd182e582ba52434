"""Unconditional DDPM on celebA-HQ-160 pklv4 at 128px, VP SDE.

Mirrors `configs/vp/unconditional_generation_celebA.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs.extra import unconditional_pkl_config


def get_config():
    config = unconditional_pkl_config(128)
    training = config.training
    training.sde = "vpsde"
    training.n_iters = 2400001
    training.likelihood_weighting = True
    training.reduce_mean = True

    sampling = config.sampling
    sampling.predictor = "ancestral_sampling"
    sampling.corrector = "none"
    sampling.snr = 0.15

    model = config.model
    model.sigma_min = 0.01
    model.name = "ddpm"
    model.scale_by_sigma = False
    model.num_scales = 1000
    model.ema_rate = 0.9999
    model.nf = 128
    model.ch_mult = (1, 1, 2, 2, 4)
    model.num_res_blocks = 2
    model.attn_resolutions = (16,)
    model.dropout = 0.0
    model.embedding_type = "fourier"
    model.input_channels = 3
    model.output_channels = 3
    config.optim.warmup = 5000
    return config
