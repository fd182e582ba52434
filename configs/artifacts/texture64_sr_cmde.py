"""Reduced-flagship training artifact: 4x SR CMDE on the offline texture64
patch dataset (VERDICT round-1 item 5 — produce a trained artifact on the
real TPU).

Same recipe shape as the 64px SR interpolation configs
(`configs/ve/inverse_problems/super_resolution/interpolation/*`) with a
narrower net (nf=64) and the locally-buildable dataset from
`scripts/make_texture_dataset.py`.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_interpolation_config


def get_config():
    config = celeba_sr_interpolation_config("ours_NDV", smaxy_log10=-1.0)
    config.training.batch_size = 64
    config.training.n_iters = 60000
    config.training.log_freq = 200
    config.training.eval_freq = 2000
    config.training.snapshot_freq = 10000
    config.training.visualization_freq = 10000

    config.data.dataset = "texture64"
    config.data.base_dir = "datasets"
    config.eval.batch_size = 16
    config.eval.max_val_batches = 4

    config.model.nf = 64
    return config
