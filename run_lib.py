"""Run orchestration: train / test / multi_scale_test / evaluation_pipeline /
compute_dataset_statistics.

Reference: `run_lib.py` (train `:33`, test `:77`, multi_scale_test `:113`,
evaluation_pipeline `:106`, compute_data_stats `:335`).
"""

from __future__ import annotations

import os
from typing import Optional

from conditional_score_diffusion_tpu.training import trainer as trainer_lib


def train(config, log_path: str, checkpoint_path: Optional[str] = None):
    """Reference `run_lib.train` (incl. the optional offline dataset build,
    reference `run_lib.py:34-35`)."""
    if config.data.get("create_dataset", False):
        from conditional_score_diffusion_tpu.data.builder import create_dataset

        create_dataset(config)
    experiment = config.data.get("dataset", "experiment") or "experiment"
    log_dir = os.path.join(log_path, experiment)
    return trainer_lib.train(config, log_dir, checkpoint_path)


def test(config, log_path: str, checkpoint_path: Optional[str] = None):
    """Reference `run_lib.test`: sample on the test split, save PNG trees,
    compute metrics (see eval/harness.py)."""
    from conditional_score_diffusion_tpu.eval.harness import run_test

    return run_test(config, log_path, checkpoint_path)


def multi_scale_test(master_config, log_path: str):
    """Reference `run_lib.multi_scale_test` (autoregressive multi-scale)."""
    from conditional_score_diffusion_tpu.eval.multiscale import run_multi_scale_test

    return run_multi_scale_test(master_config, log_path)


def evaluation_pipeline(master_config):
    """Reference `run_lib.evaluation_pipeline` (offline FID/JFID over saved
    sample trees)."""
    from conditional_score_diffusion_tpu.eval.pipeline import run_evaluation_pipeline

    base = master_config.eval.base_log_dir
    task = master_config.data.task
    dataset = master_config.data.dataset
    approach = master_config.training.conditioning_approach
    images_dir = os.path.join(base, task, dataset, approach)
    results = {}
    for snr in master_config.eval.snr:
        results[snr] = run_evaluation_pipeline(task, images_dir, snr)
    return results


def compute_data_stats(config):
    """Reference `compute_dataset_statistics.py` (dataset mean for the VE
    prior shift; intensity-range analysis)."""
    from conditional_score_diffusion_tpu.data.statistics import compute_dataset_statistics

    return compute_dataset_statistics(config)
