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
    """Build the pure train step (and its optimizer, for state creation).

    Gradient accumulation (``training.accumulate_grad_batches``, reference
    `run_lib.py:58`): the incoming batch's leading axis is split into
    ``accum`` micro-batches, a `lax.scan` averages their gradients, and one
    optimizer + EMA update is applied — numerically identical to the large
    batch, with micro-batch activation memory.
    """
    tx = make_optimizer(config)
    sde_fn = make_sde_for_step(config, data_mean)
    sde_template = sde_fn(0)
    loss_fn = build_loss_fn(config, module, sde_template, train=True)
    accum = int(config.training.get("accumulate_grad_batches", 1) or 1)

    def _loss_grads(params, sde, batch, rng):
        return jax.value_and_grad(lambda p: loss_fn(p, sde, batch, rng))(params)

    def train_step(state: TrainState, batch: Any, rng) -> Tuple[TrainState, dict]:
        step_rng = jax.random.fold_in(rng, state.step)
        sde = sde_fn(state.step)
        if accum > 1:
            B = jax.tree.leaves(batch)[0].shape[0]
            if B % accum:
                raise ValueError(
                    f"training.batch_size ({B}) must be divisible by "
                    f"accumulate_grad_batches ({accum})"
                )
            micro = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]), batch
            )

            def body(carry, mb_and_i):
                mb, i = mb_and_i
                loss_i, grads_i = _loss_grads(
                    state.params, sde, mb, jax.random.fold_in(step_rng, i)
                )
                loss_acc, grads_acc = carry
                return (
                    loss_acc + loss_i,
                    jax.tree.map(jnp.add, grads_acc, grads_i),
                ), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero_grads), (micro, jnp.arange(accum))
            )
            loss = loss / accum
            grads = jax.tree.map(lambda g: g / accum, grads)
        else:
            loss, grads = _loss_grads(state.params, sde, batch, step_rng)
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
