"""Probability-flow ODE sampler.

Reference: `sampling/unconditional.py:93-158` (scipy RK45 black-box solver
with a final reverse-diffusion denoise step).  TPU design: the integration
runs fully on device via `jax.experimental.ode.odeint` (adaptive Dormand-
Prince) — no host round-trips per step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental.ode import odeint

from .predictors import reverse_diffusion


def get_ode_sampler(
    sde,
    shape: Sequence[int],
    denoise: bool = False,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    eps: float = 1e-3,
) -> Callable:
    """Returns ``ode_sampler(rng, score_fn, z=None) -> (samples, info)``."""

    def ode_sampler(rng, score_fn, z=None):
        rng, prior_rng, denoise_rng = jax.random.split(rng, 3)
        x0 = sde.prior_sampling(prior_rng, tuple(shape)) if z is None else z

        rsde = sde.reverse(score_fn, probability_flow=True)

        def dynamics(x, s):
            # integrate s: 0 -> T - eps with t = T - s.  Clamp to the
            # integration domain: odeint's initial-step heuristic can probe
            # far outside it when the drift is tiny (e.g. an init_scale=0
            # output conv), and time embeddings NaN at t -> +-inf.
            t = jnp.clip(sde.T - s, eps, sde.T)
            vec_t = jnp.full((x.shape[0],), t)
            drift, _ = rsde.sde(x, vec_t)
            return -drift

        ts = jnp.array([0.0, sde.T - eps])
        xs = odeint(dynamics, x0, ts, rtol=rtol, atol=atol)
        x = xs[-1]

        if denoise:
            vec_eps = jnp.full((x.shape[0],), eps)
            _, x = reverse_diffusion(
                denoise_rng, x, vec_eps, sde=sde, score_fn=score_fn
            )
        return x, {"nfe": -1}

    return ode_sampler
