"""End-to-end: train the toy FCN on GaussianBubbles over the 8-device CPU
mesh, then PC-sample and check the learned distribution.

This is the framework's integration smoke test (SURVEY.md §4), exercising
L8->L0: config -> datamodule -> model -> sharded train step -> checkpointed
state -> sampler.
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from configs.toy_gaussian_bubbles import get_config
from conditional_score_diffusion_tpu.sampling import get_sampling_fn
from conditional_score_diffusion_tpu.sde import build_sde
from conditional_score_diffusion_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def trained():
    config = get_config()
    config.training.n_iters = 600
    config.training.log_freq = 100
    config.training.eval_freq = 300
    config.training.snapshot_freq = 600
    config.optim.warmup = 50
    config.data.data_samples = 20000
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(config, tmp)
        history = trainer.fit()
        yield config, trainer, history


def test_loss_decreases(trained):
    _, _, history = trained
    losses = [l for _, l in history["train_loss"]]
    assert losses[-1] < losses[0] * 0.7, f"no training progress: {losses}"


def test_eval_loss_finite(trained):
    _, _, history = trained
    assert history["eval_loss"], "eval never ran"
    assert np.isfinite(history["eval_loss"][-1][1])


def test_state_sharding_is_mesh_wide(trained):
    _, trainer, _ = trained
    # replicated across the 8 virtual devices
    leaf = jax.tree.leaves(trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_samples_match_mixture(trained):
    config, trainer, _ = trained
    sde, eps = build_sde(config)
    sampling_fn = get_sampling_fn(
        config, sde, (512, 2), eps, trainer.module, p_steps=200
    )
    samples, _ = sampling_fn(jax.random.key(0), trainer.state.ema.params)
    samples = np.asarray(samples)
    assert np.isfinite(samples).all()
    radii = np.linalg.norm(samples, axis=1)
    # GaussianBubbles: 4 mixtures on the unit circle, scale 0.2
    assert abs(float(radii.mean()) - 1.0) < 0.25, f"mean radius {radii.mean()}"
    # samples should be near SOME center, i.e. small spread of radii
    assert float(radii.std()) < 0.45, f"radius std {radii.std()}"


def test_checkpoint_roundtrip(trained):
    config, trainer, _ = trained
    from conditional_score_diffusion_tpu.training.checkpoint import CheckpointManager

    ckpt_dir = os.path.join(trainer.log_path, "checkpoints")
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 600
    restored = mgr.restore(trainer.state)
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(trainer.state.step)
    )
    a = jax.tree.leaves(restored.ema.params)[0]
    b = jax.tree.leaves(trainer.state.ema.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_val_cap_and_callback_failure_surfacing():
    """config.eval.max_val_batches bounds run_eval; callback exceptions are
    counted + surfaced instead of silently printed (VERDICT r1 weak 4/5)."""
    config = get_config()
    config.training.n_iters = 3
    config.training.log_freq = 1
    config.training.eval_freq = 1
    config.training.snapshot_freq = 3
    config.eval.max_val_batches = 2
    config.data.data_samples = 4000

    pulled = []

    class FailingCallback:
        def __call__(self, trainer, step):
            raise RuntimeError("boom")

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(config, tmp)
        orig = trainer.datamodule.val_iterator

        def counting_val_iterator(*a, **kw):
            def gen():
                for b in orig(*a, **kw):
                    pulled.append(1)
                    yield b
            return gen()

        trainer.datamodule.val_iterator = counting_val_iterator
        trainer.fit(callbacks=[FailingCallback()])

    # eval ran 3 times; the cap allows at most max_val_batches+1 pulls each
    assert len(pulled) <= 3 * (config.eval.max_val_batches + 1), len(pulled)
    assert trainer.callback_failures.get("FailingCallback") == 3


def test_sustained_window_counts_steps_after_unaligned_resume():
    """ADVICE r4 (medium): the sustained-throughput window must count the
    actual steps since the last log, not assume a full log_freq window —
    an unaligned resume (e.g. restart at step 7 with log_freq 5) used to
    overstate img/s by log_freq / (boundary - resume_step)."""
    config = get_config()
    config.training.n_iters = 15
    config.training.log_freq = 5
    config.training.eval_freq = 10_000  # no eval inside this run
    config.training.snapshot_freq = 10_000
    config.data.data_samples = 4000

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(config, tmp)
        # simulate a resume at an unaligned step
        trainer.state = trainer.state.replace(step=7)
        windows = {}
        orig_log = trainer.log_scalar

        def recording_log(tag, value, step):
            if tag == "window_steps":
                windows[step] = value
            return orig_log(tag, value, step)

        trainer.log_scalar = recording_log
        trainer.fit(callbacks=[])

    # start=7: first log at step 8 (step == start) covers 1 step;
    # boundary log at step 10 covers 10-8=2 steps (NOT log_freq=5);
    # then a full window at step 15 covers 5 steps.
    assert windows == {8: 1, 10: 2, 15: 5}, windows
