"""Toy 2-D GaussianBubbles config: FCN score net + VE SDE.

Counterpart of the reference's Synthetic dataset + `fcn` model path
(`lightning_data_modules/SyntheticDataset.py`, `models/fcn.py`) — the
fastest end-to-end training slice (SURVEY.md §4 smoke test).
"""

from conditional_score_diffusion_tpu.configs import base_config


def get_config():
    config = base_config()

    config.training.batch_size = 256
    config.training.n_iters = 10000
    config.training.log_freq = 100
    config.training.eval_freq = 1000
    config.training.snapshot_freq = 2000
    config.training.visualization_callback = "2D"

    config.data.datamodule = "Synthetic"
    config.data.dataset = "Synthetic"
    config.data.dataset_type = "GaussianBubbles"
    config.data.data_samples = 100000
    config.data.mixtures = 4
    config.data.return_mixtures = False
    config.data.shape = [2]

    config.model.name = "fcn"
    config.model.state_size = 2
    config.model.hidden_layers = 2
    config.model.hidden_nodes = 128
    config.model.dropout = 0.0
    config.model.sigma_min = 0.01
    config.model.sigma_max = 2.0
    config.model.num_scales = 500

    config.optim.lr = 1e-3
    config.optim.warmup = 100

    config.sampling.snr = 0.15
    return config
