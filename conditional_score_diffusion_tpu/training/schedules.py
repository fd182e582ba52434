"""VS-CMDE decreasing-variance schedule as pure functions of the step.

Reference: `lightning_callbacks/callbacks.py:23-116` — the callback rebuilds
sde['y'] and both loss functions *every training batch* with
sigma_y = f(global_step), f the inverse-multiplicative reduction
``f(x) = xk*yk*y0 / (x*(y0-yk) + xk*yk)``  (`callbacks.py:81-86`).

Here the schedule is evaluated inside the jitted train step: sigma_y is a
traced scalar flowing into the (pytree-leaf) SDE hyperparameters, so there
is no per-batch Python rebuild and no retracing.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def reduction_fn(x, y0: float, xk: float, yk: float):
    """Inverse-multiplicative anneal from y0 (at x=0) to yk (at x=xk)."""
    x = jnp.asarray(x, jnp.float32)
    return xk * yk * y0 / (x * (y0 - yk) + xk * yk)


def sigma_y_at_step(config, step) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Current (sigma_min_y, sigma_max_y) for a VS-CMDE config.

    Mirrors `DecreasingVarianceConfigurationSetterCallback.__init__`
    (`callbacks.py:25-33`): sigma_max_y anneals from ``model.sigma_max_y``
    to ``model.sigma_max_y_target`` over ``model.reach_target_steps`` steps,
    sigma_min_y likewise to ``model.sigma_min_y_target``.
    """
    m = config.model
    smax = reduction_fn(step, m.sigma_max_y, m.reach_target_steps, m.sigma_max_y_target)
    smin = reduction_fn(step, m.sigma_min_y, m.reach_target_steps, m.sigma_min_y_target)
    return smin, smax


def is_decreasing_variance(config) -> bool:
    """True for VS-CMDE (`lightning_module = '*conditional_decreasing_variance'`)."""
    lm = config.training.get("lightning_module", "base")
    return "decreasing_variance" in lm
