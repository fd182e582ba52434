"""VS-CMDE end-to-end: the sigma_y schedule anneals inside the jitted train
step, training progresses, and test-time reconfiguration restores the
scheduled sigma_y (the reference's callback-driven per-batch rebuild,
`lightning_callbacks/callbacks.py:23-116`, as pure functions)."""

import os
import sys

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from conditional_score_diffusion_tpu.models import init_model
from conditional_score_diffusion_tpu.training.schedules import reduction_fn, sigma_y_at_step
from conditional_score_diffusion_tpu.training.state import create_train_state
from conditional_score_diffusion_tpu.training.steps import make_sde_for_step, make_train_step
from conditional_score_diffusion_tpu.training.tasks import create_task


def _vscmde_config():
    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(
        dict(sde="vesde", continuous=True, reduce_mean=True,
             likelihood_weighting=True, conditioning_approach="ours_DV",
             lightning_module="conditional_decreasing_variance",
             accumulate_grad_batches=1)
    )
    c.sampling = ml_collections.ConfigDict(
        dict(method="pc", predictor="conditional_reverse_diffusion",
             corrector="conditional_langevin", n_steps_each=1,
             noise_removal=True, probability_flow=False, snr=0.15)
    )
    c.data = ml_collections.ConfigDict(
        dict(shape_x=[2], shape_y=[2], centered=True)
    )
    c.model = ml_collections.ConfigDict(
        dict(name="fcn_paired", num_scales=50,
             sigma_max_x=float(np.sqrt(2)), sigma_min_x=5e-3,
             sigma_max_y=float(np.sqrt(2)), sigma_min_y=5e-3,
             sigma_max_y_target=0.1, sigma_min_y_target=5e-3,
             reach_target_steps=1000, ema_rate=0.999,
             state_size=4, hidden_layers=1, hidden_nodes=32, dropout=0.0)
    )
    c.optim = ml_collections.ConfigDict(
        dict(optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8,
             weight_decay=0, warmup=10, grad_clip=1.0)
    )
    c.seed = 0
    return c


# a tiny paired FCN for 2-D (x,y) dict batches
import flax.linen as nn

from conditional_score_diffusion_tpu.models import register_model


@register_model(name="fcn_paired")
class FCNPaired(nn.Module):
    hidden_nodes: int

    @classmethod
    def from_config(cls, config):
        return cls(hidden_nodes=config.model.hidden_nodes)

    @nn.compact
    def __call__(self, inputs, t, train: bool = False):
        h = jnp.concatenate([inputs["x"], inputs["y"], t[:, None]], axis=1)
        h = nn.relu(nn.Dense(self.hidden_nodes)(h))
        h = nn.Dense(4)(h)
        return {"x": h[:, :2], "y": h[:, 2:]}


def test_schedule_reduction_fn_endpoints():
    assert float(reduction_fn(0, y0=10.0, xk=100, yk=1.0)) == 10.0
    np.testing.assert_allclose(float(reduction_fn(100, y0=10.0, xk=100, yk=1.0)), 1.0, rtol=1e-6)
    # monotonically decreasing
    vals = [float(reduction_fn(s, 10.0, 100, 1.0)) for s in range(0, 101, 20)]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_sigma_y_anneals_inside_jitted_step():
    c = _vscmde_config()
    module, params = init_model(c, jax.random.key(0))
    train_step, tx = make_train_step(c, module)
    state = create_train_state(c, params, tx)
    step = jax.jit(train_step)

    sde_fn = make_sde_for_step(c)
    # the sde used at step 0 and step 500 must have different sigma_max_y
    s0 = float(sde_fn(jnp.asarray(0))["y"].sigma_max)
    s500 = float(sde_fn(jnp.asarray(500))["y"].sigma_max)
    assert s0 > s500 > c.model.sigma_max_y_target

    batch = {
        "x": np.random.RandomState(0).randn(16, 2).astype(np.float32),
        "y": np.random.RandomState(1).randn(16, 2).astype(np.float32),
    }
    losses = []
    rng = jax.random.key(1)
    for i in range(60):
        state, m = step(state, batch, rng)
        if i % 20 == 0:
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # training on a fixed batch must fit it


def test_test_time_reconfigure_restores_scheduled_sigma():
    c = _vscmde_config()
    module, _ = init_model(c, jax.random.key(0))
    task = create_task(c, module)
    sde = task.reconfigure(step=500)
    smin, smax = sigma_y_at_step(c, 500)
    np.testing.assert_allclose(float(sde["y"].sigma_max), float(smax), rtol=1e-6)
    np.testing.assert_allclose(float(sde["y"].sigma_min), float(smin), rtol=1e-6)


def test_vscmde_sampling_runs():
    c = _vscmde_config()
    module, params = init_model(c, jax.random.key(0))
    task = create_task(c, module)
    task.reconfigure(step=1000)
    fn = task.sampling_fn((4, 2), p_steps=20)
    samples, _ = fn(jax.random.key(0), params, jnp.zeros((4, 2)))
    assert samples.shape == (4, 2)
    assert np.isfinite(np.asarray(samples)).all()


def test_deprecated_dv_task_anneals_only_sigma_max():
    """Reference `ConditionalSdeGenerativeModel.py:87-134`: the deprecated
    module anneals sigma_max_y but leaves sigma_min_y at its config value."""
    from conditional_score_diffusion_tpu.training.tasks import create_task

    c = _vscmde_config()
    c.training.lightning_module = "deprecated_conditional_decreasing_variance"
    module = FCNPaired.from_config(c)
    task = create_task(c, module)
    sde0 = task.sde_for_step(0)
    sde_late = task.sde_for_step(500)
    assert float(sde_late["y"].sigma_max) < float(sde0["y"].sigma_max)
    np.testing.assert_allclose(float(sde_late["y"].sigma_min), c.model.sigma_min_y)
    np.testing.assert_allclose(float(sde0["y"].sigma_min), c.model.sigma_min_y)
