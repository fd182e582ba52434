"""Corrector algorithms: score-based MCMC refinement steps.

Reference: `sampling/correctors.py` (langevin `:51`, ald `:111`, none `:145`,
+ conditional variants).  Signature:
``update(rng, x, t, *, sde, score_fn, snr, n_steps, y=None) -> (x, x_mean)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import registry
from ..sde import VPSDE, batch_mul

register_corrector = registry.correctors.register
get_corrector = registry.correctors.get


def _alpha(sde, t):
    if isinstance(sde, VPSDE):
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        return sde.alphas[timestep]
    return jnp.ones_like(t)


@register_corrector(name="langevin")
def langevin(rng, x, t, *, sde, score_fn, snr, n_steps, y=None):
    """SNR-adaptive Langevin MCMC (reference `sampling/correctors.py:51-108`).

    The n_steps inner loop is unrolled at trace time (n_steps is small and
    static), keeping per-step fresh noise exactly like the reference.
    """
    alpha = _alpha(sde, t)
    x_mean = x
    for i in range(n_steps):
        rng_i = jax.random.fold_in(rng, i)
        grad = score_fn(x, t) if y is None else score_fn(x, y, t)
        noise = jax.random.normal(rng_i, x.shape)
        grad_norm = jnp.mean(
            jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1)
        )
        noise_norm = jnp.mean(
            jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1)
        )
        step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
        x_mean = x + batch_mul(step_size, grad)
        x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
    return x, x_mean


@register_corrector(name="ald")
def annealed_langevin(rng, x, t, *, sde, score_fn, snr, n_steps, y=None):
    """Original NCSN annealed Langevin dynamics (reference `correctors.py:111-142`)."""
    alpha = _alpha(sde, t)
    std = sde.marginal_prob(x, t)[1]
    x_mean = x
    for i in range(n_steps):
        rng_i = jax.random.fold_in(rng, i)
        grad = score_fn(x, t) if y is None else score_fn(x, y, t)
        noise = jax.random.normal(rng_i, x.shape)
        step_size = (snr * std) ** 2 * 2 * alpha
        x_mean = x + batch_mul(step_size, grad)
        x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
    return x, x_mean


@register_corrector(name="none")
def none_corrector(rng, x, t, *, sde=None, score_fn=None, snr=None, n_steps=0, y=None):
    """Reference `sampling/correctors.py:145-153`."""
    return x, x


registry.correctors.register(langevin, name="conditional_langevin")
registry.correctors.register(none_corrector, name="conditional_none")
