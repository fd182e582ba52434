"""Shared config defaults.

Field names and semantics match the reference's config schema exactly (so
runtime code written against reference configs works against these), but
values are composed rather than copy-pasted per experiment.
"""

from __future__ import annotations

import ml_collections
from ml_collections import config_dict


def base_config() -> ml_collections.ConfigDict:
    config = ml_collections.ConfigDict()

    # training
    config.training = training = ml_collections.ConfigDict()
    training.lightning_module = "base"
    training.batch_size = 128
    training.num_nodes = 1
    training.gpus = 1
    training.accelerator = None
    training.accumulate_grad_batches = 1
    training.workers = 4
    training.num_epochs = 10000
    training.n_iters = 500000
    training.snapshot_freq = 5000
    training.log_freq = 250
    training.eval_freq = 2500
    training.visualization_callback = "base"
    training.visualization_freq = 0  # 0 -> follow snapshot_freq
    training.show_evolution = False
    training.likelihood_weighting = True
    training.continuous = True
    training.reduce_mean = True
    training.sde = "vesde"
    training.snapshot_freq_for_preemption = 5000
    training.snapshot_sampling = True

    # sampling
    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.method = "pc"
    sampling.predictor = "reverse_diffusion"
    sampling.corrector = "langevin"
    sampling.n_steps_each = 1
    sampling.noise_removal = True
    sampling.probability_flow = False
    sampling.snr = 0.15
    sampling.use_path = False

    # evaluation
    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.workers = 4
    evaluate.batch_size = 64
    evaluate.callback = "base"
    evaluate.evaluation_metrics = ["lpips", "psnr", "ssim", "consistency", "diversity"]
    evaluate.predictor = "default"
    evaluate.corrector = "default"
    # p_steps/c_steps take 'default' or an int (object-typed so CLI/test
    # overrides with ints are legal under ml_collections type locking)
    evaluate.p_steps = config_dict.FieldReference("default", field_type=object)
    evaluate.c_steps = config_dict.FieldReference("default", field_type=object)
    evaluate.snr = [0.15]
    evaluate.denoise = True
    evaluate.use_path = False
    evaluate.draws = [2]
    evaluate.save_samples = True
    evaluate.first_test_batch = 0
    evaluate.last_test_batch = 1
    evaluate.base_log_dir = "evaluation"
    # legacy-path eval knobs carried by every reference config
    # (reference configs/default_cifar10_configs.py:31-38)
    evaluate.begin_ckpt = 50
    evaluate.end_ckpt = 96
    evaluate.enable_sampling = True
    evaluate.num_samples = 50000
    evaluate.enable_loss = True
    evaluate.enable_bpd = False
    evaluate.bpd_dataset = "test"
    # run_eval batch cap: 0 -> evaluate the full validation split
    evaluate.max_val_batches = 0

    # validation (reference Synthetic config carries this section)
    config.validation = validation = ml_collections.ConfigDict()
    validation.batch_size = 128
    validation.workers = 4

    # data
    config.data = data = ml_collections.ConfigDict()
    data.base_dir = "datasets"
    data.dataset = ""
    data.datamodule = ""
    data.use_data_mean = False
    data.create_dataset = False
    data.split = [0.8, 0.1, 0.1]
    data.centered = False
    data.uniform_dequantization = False

    # model
    config.model = model = ml_collections.ConfigDict()
    model.checkpoint_path = ""
    model.num_scales = 1000
    model.sigma_min = 0.01
    model.sigma_max = 50.0
    model.beta_min = 0.1
    model.beta_max = 20.0
    model.dropout = 0.1
    model.embedding_type = "positional"
    model.name = ""
    model.scale_by_sigma = True
    model.ema_rate = 0.999
    model.normalization = "GroupNorm"
    model.nonlinearity = "swish"

    # optimization
    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0
    optim.optimizer = "Adam"
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 2500
    optim.grad_clip = 1.0

    config.seed = 42
    return config


def image_model_defaults(model: ml_collections.ConfigDict) -> ml_collections.ConfigDict:
    """NCSN++/DDPM U-Net defaults shared by every image config."""
    model.nf = 128
    model.ch_mult = (1, 2, 2, 2)
    model.num_res_blocks = 2
    model.attn_resolutions = (16,)
    model.resamp_with_conv = True
    model.conditional = True
    model.fir = True
    model.fir_kernel = [1, 3, 3, 1]
    model.skip_rescale = True
    model.resblock_type = "biggan"
    model.progressive = "none"
    model.progressive_input = "none"
    model.progressive_combine = "sum"
    model.attention_type = "ddpm"
    model.init_scale = 0.0
    model.fourier_scale = 16
    model.conv_size = 3
    return model
