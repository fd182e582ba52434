"""Callback registry parity + smoke runs of the visualization callbacks.

The reference registers 13 callback names (`lightning_callbacks/*.py`);
configs reference them via ``training.visualization_callback`` /
``eval.callbacks``, so every name must resolve here too.
"""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import pytest

from conditional_score_diffusion_tpu import registry
from conditional_score_diffusion_tpu.models import init_model
from conditional_score_diffusion_tpu.training.callbacks import get_callback
from conditional_score_diffusion_tpu.training.state import create_train_state

REFERENCE_CALLBACK_NAMES = {
    "configuration",
    "decreasing_variance_configuration",
    "ema",
    "base",
    "GradientVisualization",
    "2DVisualization",
    "paired",
    "test_paired",
    "paired3D",
    "haar_multiscale",
    "conditional_haar_multiscale",
    "bicubic_SR",
    "KxSR",
}


def test_all_reference_callback_names_registered():
    for name in REFERENCE_CALLBACK_NAMES:
        assert get_callback(name) is not None, name


def _cmde_config(x_channels=3, y_channels=3, size=8):
    c = ml_collections.ConfigDict()
    c.seed = 0
    c.training = ml_collections.ConfigDict(
        dict(sde="snrsde", continuous=True, batch_size=2, likelihood_weighting=True,
             reduce_mean=True, lightning_module="conditional",
             conditioning_approach="ours_NDV", visualization_freq=1,
             show_evolution=False, snapshot_freq=100)
    )
    c.training.sde = "vesde"
    c.sampling = ml_collections.ConfigDict(
        dict(method="pc", predictor="conditional_reverse_diffusion",
             corrector="conditional_none", n_steps_each=1, noise_removal=True,
             probability_flow=False, snr=0.15)
    )
    c.data = ml_collections.ConfigDict(
        dict(image_size=size, effective_image_size=size, centered=False,
             num_channels=x_channels + y_channels,
             shape_x=[x_channels, size, size], shape_y=[y_channels, size, size],
             use_data_mean=False, scale=2)
    )
    c.model = ml_collections.ConfigDict(
        dict(name="ddpm_paired", nf=8, ch_mult=(1,), num_res_blocks=1,
             attn_resolutions=(), dropout=0.0, resamp_with_conv=True,
             conditional=True, nonlinearity="swish", num_scales=5,
             sigma_min=0.01, sigma_max=5.0, sigma_min_x=0.01, sigma_max_x=5.0,
             sigma_min_y=0.01, sigma_max_y=1.0, ema_rate=0.999,
             input_channels=x_channels + y_channels,
             output_channels=x_channels + y_channels,
             nonlinearity_fn="swish")
    )
    c.optim = ml_collections.ConfigDict(
        dict(optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8, weight_decay=0.0,
             warmup=0, grad_clip=1.0)
    )
    c.eval = ml_collections.ConfigDict(dict(batch_size=2))
    return c


class _StubDataModule:
    def __init__(self, batch):
        self._batch = batch

    def val_iterator(self, batch_size=None):
        yield self._batch


class _StubTrainer:
    writer = None

    def __init__(self, config, batch):
        self.module, params = init_model(config, jax.random.key(0))
        self.state = create_train_state(config, params)
        self.datamodule = _StubDataModule(batch)


@pytest.mark.parametrize("name", ["paired", "bicubic_SR", "KxSR"])
def test_conditional_visualization_callbacks_run(name):
    config = _cmde_config()
    rng = np.random.RandomState(0)
    if name in ("bicubic_SR", "KxSR"):
        # SR batches: y is the low-resolution image; the 2x models
        # squeeze/resize domains to a shared resolution
        y = rng.rand(2, 4, 4, 3).astype(np.float32)
        config.data.shape_y = [3, 4, 4]
        config.data.target_resolution = 8
        config.model.name = "ddpm_2xSR" if name == "bicubic_SR" else "ddpm_KxSR"
        config.model.input_channels = 15  # squeezed x (12) + y (3)
        config.model.output_channels = 15
    else:
        y = rng.rand(2, 8, 8, 3).astype(np.float32)
    batch = {"x": rng.rand(2, 8, 8, 3).astype(np.float32), "y": y}
    trainer = _StubTrainer(config, batch)
    cb = get_callback(name)(config)
    cb(trainer, 0)  # must sample + build grids without error (writer=None)


def test_conditional_haar_multiscale_callback_runs():
    # haar task: y = DC (3ch), x = HF (9ch); model diffuses the 12ch stack
    config = _cmde_config(x_channels=9, y_channels=3, size=8)
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.rand(2, 8, 8, 9).astype(np.float32),
        "y": rng.rand(2, 8, 8, 3).astype(np.float32),
    }
    trainer = _StubTrainer(config, batch)
    cb = get_callback("conditional_haar_multiscale")(config)
    cb(trainer, 0)


def test_test_paired_is_noop_marker():
    config = _cmde_config()
    cb = get_callback("test_paired")(config)
    assert cb(object(), 0) is None


def test_all_shipped_config_callbacks_resolve():
    """get_callbacks now raises on unknown visualization_callback names, so
    every shipped config's callback must resolve."""
    import glob
    import importlib.util

    checked = 0
    for f in sorted(glob.glob("configs/**/*.py", recursive=True)):
        if f.endswith("__init__.py"):
            continue
        spec = importlib.util.spec_from_file_location("cfg_mod", f)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        if not hasattr(m, "get_config"):
            continue
        c = m.get_config()
        viz = c.get("training", {}).get("visualization_callback", None)
        if viz:
            assert viz in registry.callbacks, (f, viz)
            checked += 1
    assert checked > 0
