"""Toy MLP score network for 2-D synthetic data.

Reference: `models/fcn.py:6-59` (``fcn``: time concatenated to the state,
ReLU MLP with dropout).  Only the per-batch-time branch is implemented; the
reference's (time_samples, batch, state) branch is unused by the live loss
path.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from . import register_model


@register_model(name="fcn")
class FCN(nn.Module):
    state_size: int
    hidden_layers: int
    hidden_nodes: int
    dropout: float

    @classmethod
    def from_config(cls, config):
        m = config.model
        return cls(
            state_size=m.state_size,
            hidden_layers=m.hidden_layers,
            hidden_nodes=m.hidden_nodes,
            dropout=m.dropout,
        )

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        h = jnp.concatenate([x, t[:, None]], axis=1)
        h = nn.Dense(self.hidden_nodes)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)
        for _ in range(self.hidden_layers):
            h = nn.Dense(self.hidden_nodes)(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.relu(h)
        return nn.Dense(self.state_size)(h)
