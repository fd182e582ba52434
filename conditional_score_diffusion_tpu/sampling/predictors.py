"""Predictor algorithms: one reverse-SDE step each.

Reference: `sampling/predictors.py` (euler_maruyama `:52`, reverse_diffusion
`:79`, ancestral_sampling `:105`, none `:182`, + conditional_* variants
which differ only in threading `y` to the score function).

Each predictor is a pure function
``update(rng, x, t, *, sde, score_fn, probability_flow=False, y=None)
-> (x, x_mean)``; the conditional registry names alias the same
implementations (the score_fn signature — ``(x, t)`` vs ``(x, y, t)`` —
is selected by whether ``y`` is passed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import registry
from ..sde import VESDE, VPSDE, batch_mul

register_predictor = registry.predictors.register
get_predictor = registry.predictors.get


def _rsde(sde, score_fn, probability_flow):
    return sde.reverse(score_fn, probability_flow)


@register_predictor(name="euler_maruyama")
def euler_maruyama(rng, x, t, *, sde, score_fn, probability_flow=False, y=None):
    """Reference `sampling/predictors.py:52-76`."""
    rsde = _rsde(sde, score_fn, probability_flow)
    dt = -1.0 / rsde.N
    z = jax.random.normal(rng, x.shape)
    drift, diffusion = rsde.sde(x, t, y)
    x_mean = x + drift * dt
    x = x_mean + batch_mul(diffusion, jnp.sqrt(-dt) * z)
    return x, x_mean


@register_predictor(name="reverse_diffusion")
def reverse_diffusion(rng, x, t, *, sde, score_fn, probability_flow=False, y=None):
    """Reference `sampling/predictors.py:79-102`."""
    rsde = _rsde(sde, score_fn, probability_flow)
    f, G = rsde.discretize(x, t, y)
    z = jax.random.normal(rng, x.shape)
    x_mean = x - f
    x = x_mean + batch_mul(G, z)
    return x, x_mean


@register_predictor(name="ancestral_sampling")
def ancestral_sampling(rng, x, t, *, sde, score_fn, probability_flow=False, y=None):
    """Reference `sampling/predictors.py:105-179` (VE and VP branches)."""
    assert not probability_flow, "Probability flow not supported by ancestral sampling"
    score = score_fn(x, t) if y is None else score_fn(x, y, t)
    timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
    noise = jax.random.normal(rng, x.shape)
    if isinstance(sde, VESDE):
        sigmas = sde.discrete_sigmas
        sigma = sigmas[timestep]
        adjacent = jnp.where(
            timestep == 0, jnp.zeros_like(sigma), sigmas[jnp.maximum(timestep - 1, 0)]
        )
        x_mean = x + batch_mul(sigma**2 - adjacent**2, score)
        std = jnp.sqrt(adjacent**2 * (sigma**2 - adjacent**2) / sigma**2)
        x = x_mean + batch_mul(std, noise)
        return x, x_mean
    if isinstance(sde, VPSDE):
        beta = sde.discrete_betas[timestep]
        x_mean = batch_mul(1.0 / jnp.sqrt(1.0 - beta), x + batch_mul(beta, score))
        x = x_mean + batch_mul(jnp.sqrt(beta), noise)
        return x, x_mean
    raise NotImplementedError(f"ancestral sampling: SDE {type(sde).__name__} unsupported")


@register_predictor(name="none")
def none_predictor(rng, x, t, *, sde=None, score_fn=None, probability_flow=False, y=None):
    """Reference `sampling/predictors.py:182-190`."""
    return x, x


# Conditional aliases (reference registers distinct classes that only thread
# `y` through; here the same functions serve both).
registry.predictors.register(euler_maruyama, name="conditional_euler_maruyama")
registry.predictors.register(reverse_diffusion, name="conditional_reverse_diffusion")
registry.predictors.register(ancestral_sampling, name="conditional_ancestral_sampling")
registry.predictors.register(none_predictor, name="conditional_none")
