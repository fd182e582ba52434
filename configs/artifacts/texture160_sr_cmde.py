"""Flagship-shape training artifact: 160px 8x-SR CMDE on the offline
texture160 patch dataset (VERDICT round-2 item 4 — train the actual
`celebA_ours_NDV_160` recipe shape on the real TPU).

Exactly the headline recipe (reference `configs/ve/inverse_problems/
super_resolution/celebA_ours_NDV_160.py`: `ddpm_paired` nf=96,
ch_mult (1,1,2,2,3,3), attn (20,10,5), 8x SR, sigma_max_y=0.5) with only
the dataset swapped for the locally-buildable texture160 patches
(`scripts/make_texture_dataset.py --out datasets/texture160 --size 160`)
served through `General_PKLDataset`'s on-the-fly SR degradation, and a
shorter schedule sized to the available wall-clock.
"""

from conditional_score_diffusion_tpu.configs.celeba_sr import celeba_sr_160_config


def get_config():
    config = celeba_sr_160_config("ours_NDV")
    config.training.batch_size = 16
    config.training.n_iters = 60000
    config.training.log_freq = 100
    config.training.eval_freq = 2000
    config.training.snapshot_freq = 2000
    config.training.visualization_freq = 5000

    config.data.dataset = "texture160"
    config.data.base_dir = "datasets"
    config.data.datamodule = "General_PKLDataset"
    config.eval.batch_size = 8
    config.eval.max_val_batches = 4
    config.eval.first_test_batch = 0
    config.eval.last_test_batch = 4
    config.eval.draws = [2, 3, 4]
    return config
