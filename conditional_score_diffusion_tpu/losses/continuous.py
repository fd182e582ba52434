"""Continuous denoising-score-matching losses.

Reference: `losses.py:55-234` (`get_sde_loss_fn`, `get_general_sde_loss_fn`
with its four branches: unconditional, SR3 single-SDE conditional, 2-key
multi-speed dict, and >=3-key generalized dict).

All losses are pure functions ``loss_fn(params, batch, rng) -> scalar`` and
jit/pjit-compatible.  The SDE is threaded in as an argument so traced
hyperparameters (VS-CMDE's sigma_y) flow through without retracing.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..models.wrappers import get_score_fn
from ..sde import batch_mul, is_multispeed


def _reduce(losses_flat: jnp.ndarray, reduce_mean: bool) -> jnp.ndarray:
    """Per-sample reduction over flattened data dims (reference `losses.py:113`)."""
    if reduce_mean:
        return jnp.mean(losses_flat, axis=-1)
    return 0.5 * jnp.sum(losses_flat, axis=-1)


def _flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def get_general_sde_loss_fn(
    module,
    conditional: bool = False,
    train: bool = True,
    reduce_mean: bool = True,
    likelihood_weighting: bool = True,
    eps: float = 1e-5,
) -> Callable:
    """Continuous DSM loss factory.

    Returns ``loss_fn(params, sde, batch, rng)``.  ``batch`` is:
      * an array for the unconditional branch,
      * ``{'x': ..., 'y': ...}`` for conditional branches (the reference's
        ``(y, x)`` tuple, normalized to a dict),
      * a dict of >=3 diffused quantities for the generalized branch.
    """

    def loss_fn(params, sde, batch, rng):
        if conditional and is_multispeed(sde):
            assert likelihood_weighting, (
                "Multi-speed diffusion supports only likelihood weighting "
                "(reference losses.py:118,149)."
            )
            # Only SDE domains are diffused; batches may carry extra keys
            # (e.g. the inpainting 'mask', `pkl_datasets.py:199`) that the
            # loss must ignore (reference losses.py:116-160 iterates the
            # multi-speed SDE's domains).
            keys = sorted(k for k in batch.keys() if k in sde)
            first = keys[0]
            B = batch[first].shape[0]
            rng_t, rng = jax.random.split(rng)
            rng_train = None
            if train:
                rng_train, rng = jax.random.split(rng)
            t = jax.random.uniform(rng_t, (B,), minval=eps, maxval=sde[first].T)

            score_fn = get_score_fn(
                sde,
                module,
                params,
                conditional=True,
                train=train,
                continuous=True,
                rngs={"dropout": rng_train} if train else None,
            )

            noise: Dict[str, jnp.ndarray] = {}
            stds: Dict[str, jnp.ndarray] = {}
            perturbed: Dict[str, jnp.ndarray] = {}
            for k in keys:
                rng_z, rng = jax.random.split(rng)
                z = jax.random.normal(rng_z, batch[k].shape)
                mean, std = sde[k].marginal_prob(batch[k], t)
                noise[k] = z
                stds[k] = std
                perturbed[k] = mean + batch_mul(std, z)

            score = score_fn(perturbed, t)

            parts = []
            for k in keys:
                g2 = sde[k].sde(jnp.zeros_like(batch[k]), t)[1] ** 2
                l = jnp.square(score[k] + batch_mul(1.0 / stds[k], noise[k]))
                parts.append(_flat(batch_mul(g2, l)))
            losses = jnp.concatenate(parts, axis=-1)
            return jnp.mean(_reduce(losses, reduce_mean))

        if conditional:
            # SR3/CDE: perturb x only; y enters the network clean
            # (reference `losses.py:184-205`).
            def sr3_loss(params, sde, batch, rng):
                x, y = batch["x"], batch["y"]
                B = x.shape[0]
                rng_t, rng_z, rng_train = jax.random.split(rng, 3)
                t = jax.random.uniform(rng_t, (B,), minval=eps, maxval=sde.T)
                score_fn = get_score_fn(
                    sde,
                    module,
                    params,
                    conditional=True,
                    train=train,
                    continuous=True,
                    rngs={"dropout": rng_train} if train else None,
                )
                z = jax.random.normal(rng_z, x.shape)
                mean, std = sde.marginal_prob(x, t)
                perturbed = {"x": mean + batch_mul(std, z), "y": y}
                score = score_fn(perturbed, t)
                if likelihood_weighting:
                    g2 = sde.sde(jnp.zeros_like(x), t)[1] ** 2
                    l = jnp.square(score + batch_mul(1.0 / std, z))
                    per_sample = _reduce(_flat(l), reduce_mean) * g2
                else:
                    l = jnp.square(batch_mul(std, score) + z)
                    per_sample = _reduce(_flat(l), reduce_mean)
                return jnp.mean(per_sample)

            return sr3_loss(params, sde, batch, rng)

        # Unconditional (reference `losses.py:208-232`).
        B = batch.shape[0]
        rng_t, rng_z, rng_train = jax.random.split(rng, 3)
        t = jax.random.uniform(rng_t, (B,), minval=eps, maxval=sde.T)
        score_fn = get_score_fn(
            sde,
            module,
            params,
            conditional=False,
            train=train,
            continuous=True,
            rngs={"dropout": rng_train} if train else None,
        )
        z = jax.random.normal(rng_z, batch.shape)
        mean, std = sde.marginal_prob(batch, t)
        perturbed = mean + batch_mul(std, z)
        score = score_fn(perturbed, t)
        if likelihood_weighting:
            g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
            l = jnp.square(score + batch_mul(1.0 / std, z))
            per_sample = _reduce(_flat(l), reduce_mean) * g2
        else:
            l = jnp.square(batch_mul(std, score) + z)
            per_sample = _reduce(_flat(l), reduce_mean)
        return jnp.mean(per_sample)

    return loss_fn
