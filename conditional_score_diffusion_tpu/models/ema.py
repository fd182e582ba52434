"""Exponential moving average of parameters, as train-state data.

Reference: `models/ema.py:14-188` (weakref-based ExponentialMovingAverage
with the warmup decay schedule ``min(decay, (1+n)/(10+n))``).

Design: EMA shadow params live *inside* the checkpointed train state (the
reference created them in a callback and never checkpointed them —
SURVEY.md §5 flags this as a flaw to fix).  `ema_update` is a pure function
applied inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    decay: jnp.ndarray
    num_updates: jnp.ndarray
    params: Any

    @classmethod
    def create(cls, params, decay: float) -> "EMAState":
        return cls(
            decay=jnp.asarray(decay, jnp.float32),
            num_updates=jnp.asarray(0, jnp.int32),
            # Copy so the shadow never aliases the live params — aliasing
            # breaks buffer donation ("donate the same buffer twice").
            params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        )


def ema_update(ema: EMAState, new_params) -> EMAState:
    """One EMA step with warmup decay (reference `models/ema.py:60-78`)."""
    n = ema.num_updates + 1
    decay = jnp.minimum(ema.decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p), ema.params, new_params
    )
    return EMAState(decay=ema.decay, num_updates=n, params=shadow)
