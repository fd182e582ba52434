"""Discrete-time legacy losses: SMLD, DDPM, inverse-problem SMLD.

Reference: `losses.py:236-344` (`get_smld_loss_fn`,
`get_inverse_problem_smld_loss_fn` with its per-domain sigma labels and SMLD
weighting sigma_x^2 sigma_y^2 / (sigma_x^2 + sigma_y^2), `get_ddpm_loss_fn`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..models.wrappers import get_model_fn, get_score_fn
from ..sde import batch_mul


def _reduce(losses_flat, reduce_mean):
    if reduce_mean:
        return jnp.mean(losses_flat, axis=-1)
    return 0.5 * jnp.sum(losses_flat, axis=-1)


def _flat(x):
    return x.reshape(x.shape[0], -1)


def get_smld_loss_fn(
    module, train=True, reduce_mean=False, likelihood_weighting=False
) -> Callable:
    """Per-sigma-label SMLD loss (reference `losses.py:236-265`)."""

    def loss_fn(params, vesde, batch, rng):
        B = batch.shape[0]
        rng_l, rng_z, rng_train = jax.random.split(rng, 3)
        labels = jax.random.randint(rng_l, (B,), 0, vesde.N)
        sigmas = vesde.discrete_sigmas[labels]
        z = jax.random.normal(rng_z, batch.shape)
        noise = batch_mul(sigmas, z)
        perturbed = batch + noise
        score_fn = get_score_fn(
            vesde,
            module,
            params,
            conditional=False,
            train=train,
            continuous=False,
            rngs={"dropout": rng_train} if train else None,
        )
        score = score_fn(perturbed, labels / (vesde.N - 1))
        target = -batch_mul(1.0 / sigmas**2, noise)
        losses = jnp.square(score - target)
        if likelihood_weighting:
            losses = batch_mul(sigmas**2, losses)
            per_sample = _reduce(_flat(losses), reduce_mean)
        else:
            per_sample = _reduce(_flat(losses), reduce_mean) * sigmas**2
        return jnp.mean(per_sample)

    return loss_fn


def get_inverse_problem_smld_loss_fn(
    module, train=True, reduce_mean=False, likelihood_weighting=True
) -> Callable:
    """Two-domain SMLD loss with per-domain sigma ladders (reference `losses.py:267-316`)."""

    def loss_fn(params, sde, batch, rng):
        x, y = batch["x"], batch["y"]
        B = x.shape[0]
        rng_l, rng_zx, rng_zy, rng_train = jax.random.split(rng, 4)
        labels = jax.random.randint(rng_l, (B,), 0, sde["x"].N)

        sigmas_x = sde["x"].discrete_sigmas[labels]
        sigmas_y = sde["y"].discrete_sigmas[labels]
        noise_x = batch_mul(sigmas_x, jax.random.normal(rng_zx, x.shape))
        noise_y = batch_mul(sigmas_y, jax.random.normal(rng_zy, y.shape))
        perturbed = {"x": x + noise_x, "y": y + noise_y}

        score_fn = get_score_fn(
            sde,
            module,
            params,
            conditional=True,
            train=train,
            continuous=False,
            rngs={"dropout": rng_train} if train else None,
        )
        score = score_fn(perturbed, labels / (sde["x"].N - 1))

        target_x = -batch_mul(1.0 / sigmas_x**2, noise_x)
        target_y = -batch_mul(1.0 / sigmas_y**2, noise_y)
        lx = jnp.square(score["x"] - target_x)
        ly = jnp.square(score["y"] - target_y)

        if likelihood_weighting:
            lx = batch_mul(sigmas_x**2, lx)
            ly = batch_mul(sigmas_y**2, ly)
            losses = jnp.concatenate([_flat(lx), _flat(ly)], axis=-1)
            per_sample = _reduce(losses, reduce_mean)
        else:
            losses = jnp.concatenate([_flat(lx), _flat(ly)], axis=-1)
            smld_weight = (sigmas_x**2 * sigmas_y**2) / (sigmas_x**2 + sigmas_y**2)
            per_sample = _reduce(losses, reduce_mean) * smld_weight
        return jnp.mean(per_sample)

    return loss_fn


def get_ddpm_loss_fn(module, train=True, reduce_mean=True) -> Callable:
    """Epsilon-prediction DDPM loss (reference `losses.py:320-340`)."""

    def loss_fn(params, vpsde, batch, rng):
        B = batch.shape[0]
        rng_l, rng_z, rng_train = jax.random.split(rng, 3)
        labels = jax.random.randint(rng_l, (B,), 0, vpsde.N)
        noise = jax.random.normal(rng_z, batch.shape)
        perturbed = batch_mul(vpsde.sqrt_alphas_cumprod[labels], batch) + batch_mul(
            vpsde.sqrt_1m_alphas_cumprod[labels], noise
        )
        model_fn = get_model_fn(
            module, params, train=train, rngs={"dropout": rng_train} if train else None
        )
        pred = model_fn(perturbed, labels)
        per_sample = _reduce(_flat(jnp.square(pred - noise)), reduce_mean)
        return jnp.mean(per_sample)

    return loss_fn
