"""On-TPU VS-CMDE (ours_DV) training artifact (VERDICT round-2 item 6).

Same 64px 4x-SR recipe as the texture64 CMDE artifact but with the
decreasing-variance estimator: sigma_max_y anneals from sqrt(prod shape_y)
to 0.1 over `reach_target_steps` via the inverse-multiplicative schedule
evaluated *inside* the jitted train step (reference
`lightning_callbacks/callbacks.py:23-116` rebuilds the SDE every batch);
the sigma_y state is checkpointed and test-mode restores from it.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_interpolation_config


def get_config():
    config = celeba_sr_interpolation_config("ours_DV", smaxy_log10=-1.0)
    config.training.batch_size = 64
    config.training.n_iters = 6000
    config.training.log_freq = 100
    config.training.eval_freq = 1000
    config.training.snapshot_freq = 1000
    config.training.visualization_freq = 3000

    config.data.dataset = "texture64"
    config.data.base_dir = "datasets"
    config.eval.batch_size = 16
    config.eval.max_val_batches = 2
    config.eval.first_test_batch = 0
    config.eval.last_test_batch = 2
    config.eval.draws = [2, 3]

    config.model.nf = 64
    # the interpolation builder only re-derives sigma_max_y for NDV/SR3;
    # anneal start must match the 64px shape_y (reference DV convention:
    # sigma_max_y(0) = sqrt(prod shape_y))
    import numpy as np

    config.model.sigma_max_y = float(np.sqrt(np.prod(config.data.shape_y)))
    config.model.sigma_max_y_target = 0.1
    config.model.reach_target_steps = 4000
    return config
