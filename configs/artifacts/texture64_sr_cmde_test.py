"""Test-mode recipe for the trained texture64 artifact.

Runs the full `--mode test` call stack (reference `run_lib.py:77-104` +
`lightning_callbacks/PairedCallback.py:94-259`) over the on-TPU-trained
checkpoint in `artifacts/texture64_run/`: PC-sample the test split, save
the PNG sample/gt trees, compute psnr/ssim/consistency/diversity, pickle
`test_metrics/0_4.pkl`.  The saved trees then feed
`--mode evaluation_pipeline` (reference `evaluation.py:267-449`).
"""

from configs.artifacts.texture64_sr_cmde import get_config as _train_config


def get_config():
    config = _train_config()
    config.eval.base_log_dir = "artifacts/texture64_run/evaluation"
    config.eval.first_test_batch = 0
    config.eval.last_test_batch = 4
    config.eval.draws = [2, 3, 4]
    config.model.checkpoint_path = "artifacts/texture64_run/texture64/checkpoints"
    return config
