"""Train state: params, optimizer state, EMA — one checkpointable pytree.

Reference: Lightning module + `configure_optimizers`
(`lightning_modules/BaseSdeGenerativeModel.py:75-96`: Adam + per-step
LambdaLR warmup) and the EMA callback (`lightning_callbacks/callbacks.py:119-133`).
Unlike the reference (whose EMA shadow params never reach the checkpoint —
SURVEY.md §5), everything here lives in one pytree.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax
from flax import struct

from ..models.ema import EMAState


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: EMAState


def make_optimizer(config) -> optax.GradientTransformation:
    """Adam + linear warmup + global-norm clip (reference `losses.py:26-52`
    and `run_lib.py:60` gradient_clip_val)."""
    optim = config.optim
    if optim.optimizer != "Adam":
        raise NotImplementedError(f"Optimizer {optim.optimizer!r} not supported yet!")

    if optim.warmup > 0:
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, optim.lr, optim.warmup),
                optax.constant_schedule(optim.lr),
            ],
            [optim.warmup],
        )
    else:
        schedule = optax.constant_schedule(optim.lr)

    components = []
    if optim.grad_clip > 0:
        components.append(optax.clip_by_global_norm(optim.grad_clip))
    components.append(
        optax.adamw(
            schedule,
            b1=optim.beta1,
            b2=0.999,
            eps=optim.eps,
            weight_decay=optim.weight_decay,
        )
        if optim.weight_decay
        else optax.adam(schedule, b1=optim.beta1, b2=0.999, eps=optim.eps)
    )
    return optax.chain(*components)


def create_train_state(config, params, tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    tx = tx if tx is not None else make_optimizer(config)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=EMAState.create(params, decay=config.model.ema_rate),
    )
