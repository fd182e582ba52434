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


def _evaluate_one_config(config):
    from conditional_score_diffusion_tpu.eval.pipeline import run_evaluation_pipeline

    base = config.eval.base_log_dir
    task = config.data.task
    dataset = config.data.dataset
    approach = config.training.conditioning_approach
    images_dir = os.path.join(base, task, dataset, approach)
    # seeded-mask re-roll parameters for inpainting consistency (the saved
    # PNG id k maps to dataset index first_test_batch*batch_size + k - 1,
    # the per-item mask seed — reference `evaluation.py:67-140`)
    mask_kwargs = {}
    if task == "inpainting" and config.eval.get("use_seed", False):
        mask_kwargs = dict(
            mask_coverage=config.data.get("mask_coverage", 0.25),
            mask_seed_offset=config.eval.first_test_batch * config.eval.batch_size,
        )
    results = {}
    for snr in config.eval.snr:
        results[snr] = run_evaluation_pipeline(
            task, images_dir, snr, scale=config.data.get("scale", 8), **mask_kwargs
        )
    return results


def evaluation_pipeline(master_config):
    """Reference `run_lib.evaluation_pipeline`: iterate the sub-configs of a
    master config (reference `run_lib.py:106-111`); a single leaf config is
    also accepted."""
    if "training" in master_config:  # leaf config
        return _evaluate_one_config(master_config)
    return {name: _evaluate_one_config(master_config[name]) for name in master_config}


def compute_data_stats(config):
    """Reference `compute_dataset_statistics.py` (dataset mean for the VE
    prior shift; intensity-range analysis)."""
    from conditional_score_diffusion_tpu.data.statistics import compute_dataset_statistics

    return compute_dataset_statistics(config)
