"""Unconditional NCSN++ on CIFAR-10, VE SDE, continuous training.

Mirrors `configs/ve/cifar10_ncsnpp_continuous.py` +
`configs/default_cifar10_configs.py` in the reference.
"""

from conditional_score_diffusion_tpu.configs import base_config


def get_config():
    config = base_config()

    training = config.training
    training.batch_size = 128
    training.n_iters = 1300001
    training.snapshot_freq = 50000
    training.log_freq = 50
    training.eval_freq = 100
    training.likelihood_weighting = False
    training.continuous = True
    training.reduce_mean = False
    training.sde = "vesde"

    sampling = config.sampling
    sampling.method = "pc"
    sampling.predictor = "reverse_diffusion"
    sampling.corrector = "langevin"
    sampling.snr = 0.16

    config.eval.batch_size = 1024

    data = config.data
    data.dataset = "CIFAR10"
    data.datamodule = "image"
    data.image_size = 32
    data.effective_image_size = 32
    data.random_flip = True
    data.centered = False
    data.num_channels = 3
    data.shape = [3, 32, 32]

    model = config.model
    model.sigma_min = 0.01
    model.sigma_max = 50.0
    model.num_scales = 1000
    model.dropout = 0.1
    model.embedding_type = "fourier"
    model.name = "ncsnpp"
    model.nf = 128
    model.ch_mult = (1, 2, 2, 2)
    model.num_res_blocks = 4
    model.attn_resolutions = (16,)
    model.resamp_with_conv = True
    model.conditional = True
    model.fir = True
    model.fir_kernel = [1, 3, 3, 1]
    model.skip_rescale = True
    model.resblock_type = "biggan"
    model.progressive = "none"
    model.progressive_input = "residual"
    model.progressive_combine = "sum"
    model.attention_type = "ddpm"
    model.init_scale = 0.0
    model.fourier_scale = 16
    model.conv_size = 3

    optim = config.optim
    optim.warmup = 5000

    return config
