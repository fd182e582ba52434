"""Jitted train/eval steps.

Reference call stack (SURVEY.md §3.1): Lightning `training_step` ->
`train_loss_fn` -> backward -> Adam + warmup + clip -> EMA update.  Here all
of it is one pure function ``(state, batch, rng) -> (state, metrics)``
traced once; under a data-sharded jit the gradient all-reduce is implicit.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss_fn
from ..models.ema import ema_update
from ..sde import build_sde
from .schedules import is_decreasing_variance, sigma_y_at_step
from .state import TrainState, make_optimizer


def make_sde_for_step(config, data_mean=None) -> Callable:
    """Return ``sde_fn(step) -> sde`` — static for most configs; for VS-CMDE
    the sigma_y leaves are functions of the (traced) step."""
    if is_decreasing_variance(config):

        def sde_fn(step):
            smin_y, smax_y = sigma_y_at_step(config, step)
            sde, _ = build_sde(config, data_mean=data_mean,
                               sigma_min_y=smin_y, sigma_max_y=smax_y)
            return sde

        return sde_fn

    sde, _ = build_sde(config, data_mean=data_mean)
    return lambda step: sde


def make_train_step(config, module, data_mean=None) -> Tuple[Callable, optax.GradientTransformation]:
    """Build the pure train step (and its optimizer, for state creation)."""
    tx = make_optimizer(config)
    sde_fn = make_sde_for_step(config, data_mean)
    sde_template = sde_fn(0)
    loss_fn = build_loss_fn(config, module, sde_template, train=True)

    def train_step(state: TrainState, batch: Any, rng) -> Tuple[TrainState, dict]:
        step_rng = jax.random.fold_in(rng, state.step)
        sde = sde_fn(state.step)
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, sde, batch, step_rng)
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step, tx


def make_eval_step(config, module, data_mean=None, use_ema: bool = True) -> Callable:
    """Eval loss on EMA weights (reference `losses.py:398-404` store/copy/restore
    dance — here just a different params pytree)."""
    sde_fn = make_sde_for_step(config, data_mean)
    sde_template = sde_fn(0)
    loss_fn = build_loss_fn(config, module, sde_template, train=False)

    def eval_step(state: TrainState, batch: Any, rng) -> dict:
        params = state.ema.params if use_ema else state.params
        sde = sde_fn(state.step)
        loss = loss_fn(params, sde, batch, rng)
        return {"eval_loss": loss}

    return eval_step
