"""Shared SDE helpers: broadcasting and the reverse-time SDE.

Reference: `sde_lib.py:7-142` (SDE.reverse / cSDE.reverse synthesize an RSDE
class at call time; here the reverse SDE is a tiny stateless wrapper over pure
functions, safe to build inside traced code).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def batch_mul(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Multiply a per-batch scalar (shape ``[B]``) into ``x`` (shape ``[B, ...]``).

    Equivalent to the reference's pervasive
    ``a[(...,) + (None,) * len(x.shape[1:])] * x`` broadcasting idiom.
    """
    a = jnp.asarray(a)
    x = jnp.asarray(x)
    if a.ndim == 0:
        return a * x
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim)) * x


class ReverseSDE:
    """Reverse-time SDE/ODE for a forward SDE and a score function.

    ``score_fn`` takes ``(x, t)`` or, when built with ``conditional=True``,
    ``(x, y, t)`` (reference `sde_lib.py:65-142`).  This object is a plain
    Python wrapper over pure functions — it holds no arrays of its own, so it
    can be constructed freely inside jitted code.
    """

    def __init__(self, sde, score_fn: Callable, probability_flow: bool = False):
        self.fwd = sde
        self.score_fn = score_fn
        self.probability_flow = probability_flow
        self.N = sde.N
        self.T = sde.T

    def _score(self, x, t, y=None):
        if y is None:
            return self.score_fn(x, t)
        return self.score_fn(x, y, t)

    def sde(self, x, t, y: Optional[jnp.ndarray] = None):
        """Drift and diffusion of the reverse SDE (or probability-flow ODE)."""
        drift, diffusion = self.fwd.sde(x, t)
        score = self._score(x, t, y)
        factor = 0.5 if self.probability_flow else 1.0
        drift = drift - batch_mul(diffusion**2, score) * factor
        diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
        return drift, diffusion

    def discretize(self, x, t, y: Optional[jnp.ndarray] = None):
        """Discretized reverse update terms ``(rev_f, rev_G)``."""
        f, G = self.fwd.discretize(x, t)
        score = self._score(x, t, y)
        factor = 0.5 if self.probability_flow else 1.0
        rev_f = f - batch_mul(G**2, score) * factor
        rev_G = jnp.zeros_like(G) if self.probability_flow else G
        return rev_f, rev_G
