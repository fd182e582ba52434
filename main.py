"""CLI entry point.

Reference: `main.py:8-29` — the same absl + ml_collections flag surface:

    python main.py --mode train --config configs/ve/.../celebA_ours_NDV_160.py \
        [--checkpoint_path ...] [--log_path ...]
"""

import os

import jax
from absl import app, flags
from ml_collections.config_flags import config_flags

import run_lib

# A PJRT plugin sitecustomize may override JAX_PLATFORMS at interpreter
# startup; re-assert the user's explicit choice (no-op when unset) so e.g.
# `JAX_PLATFORMS=cpu python main.py ...` really runs on CPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

FLAGS = flags.FLAGS

config_flags.DEFINE_config_file(
    "config", None, "Training configuration.", lock_config=False
)
flags.DEFINE_string("checkpoint_path", None, "Checkpoint directory to resume from.")
flags.DEFINE_string("data_path", None, "Dataset location (overrides config.data.base_dir).")
flags.DEFINE_string("log_path", "./logs/", "Directory for logs, checkpoints, samples.")
flags.DEFINE_enum(
    "mode",
    None,
    ["train", "test", "multi_scale_test", "compute_dataset_statistics", "evaluation_pipeline"],
    "Running mode.",
)
flags.DEFINE_string("eval_folder", "eval", "Folder name for evaluation results.")
flags.mark_flags_as_required(["config", "mode"])


def main(argv):
    config = FLAGS.config
    if FLAGS.data_path is not None and "base_dir" in config.data:
        config.data.base_dir = FLAGS.data_path

    if FLAGS.mode == "train":
        run_lib.train(config, FLAGS.log_path, FLAGS.checkpoint_path)
    elif FLAGS.mode == "test":
        run_lib.test(config, FLAGS.log_path, FLAGS.checkpoint_path)
    elif FLAGS.mode == "multi_scale_test":
        run_lib.multi_scale_test(config, FLAGS.log_path)
    elif FLAGS.mode == "compute_dataset_statistics":
        run_lib.compute_data_stats(config)
    elif FLAGS.mode == "evaluation_pipeline":
        run_lib.evaluation_pipeline(config)


if __name__ == "__main__":
    app.run(main)
