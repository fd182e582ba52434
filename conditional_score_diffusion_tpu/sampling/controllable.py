"""Controllable generation: colorization via gray-channel decoupling.

Reference: `controllable_generation.py:95-191` — an orthogonal matrix ``M``
whose first basis vector is the gray direction (1,1,1)/sqrt(3) decouples RGB
into (gray, chroma1, chroma2); PC sampling runs in the decoupled space with
the gray channel projected to the (noised) known gray image each step, then
couples back to RGB.  (The reference file is dead code due to a broken
import — `sampling/__init__.py` is empty there — but the capability is part
of the inventory; this is a working implementation.)

The whole loop is one `lax.scan`, like the other samplers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..sde import batch_mul
from .correctors import get_corrector
from .predictors import get_predictor


def _gray_basis() -> jnp.ndarray:
    """Orthonormal 3x3 with first row = (1,1,1)/sqrt(3) (gray direction)."""
    M = np.zeros((3, 3))
    M[0] = 1.0 / np.sqrt(3.0)
    # Gram-Schmidt completion
    M[1] = np.array([1.0, -1.0, 0.0]) / np.sqrt(2.0)
    M[2] = np.array([1.0, 1.0, -2.0]) / np.sqrt(6.0)
    return jnp.asarray(M, jnp.float32)


def decouple(x: jnp.ndarray) -> jnp.ndarray:
    """RGB (last axis) -> (gray, chroma1, chroma2)."""
    return jnp.einsum("...c,kc->...k", x, _gray_basis())


def couple(z: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...k,kc->...c", z, _gray_basis())


def get_pc_colorizer(
    sde,
    predictor: str,
    corrector: str,
    snr: float,
    n_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-5,
) -> Callable:
    """Returns ``colorizer(rng, score_fn, gray_image) -> (rgb, info)``.

    ``gray_image`` is an RGB image whose channels are all the known gray
    value (as produced by `data.degradations.grayscale` broadcast to 3ch).
    """
    predictor_fn = get_predictor(predictor)
    corrector_fn = get_corrector(corrector)

    def project(rng, x, gray, vec_t):
        """Constrain the gray channel of the decoupled state."""
        mean, std = sde.marginal_prob(gray, vec_t)
        perturbed_gray = mean + batch_mul(std, jax.random.normal(rng, gray.shape))
        z = decouple(x)
        zg = decouple(perturbed_gray)
        z = z.at[..., :1].set(zg[..., :1])
        return couple(z)

    def colorizer(rng, score_fn, gray_image, show_evolution: bool = False):
        B = gray_image.shape[0]
        rng, prior_rng = jax.random.split(rng)
        x = sde.prior_sampling(prior_rng, gray_image.shape)
        # start with the known gray channel in place
        z = decouple(x).at[..., :1].set(decouple(gray_image)[..., :1])
        x = couple(z)
        timesteps = jnp.linspace(sde.T, eps, sde.N)

        def body(carry, t):
            x, x_mean, rng = carry
            rng, rc, rmc, rp, rmp = jax.random.split(rng, 5)
            vec_t = jnp.full((B,), t)
            x, _ = corrector_fn(
                rc, x, vec_t, sde=sde, score_fn=score_fn, snr=snr, n_steps=n_steps
            )
            x = project(rmc, x, gray_image, vec_t)
            x, x_mean = predictor_fn(
                rp, x, vec_t, sde=sde, score_fn=score_fn, probability_flow=probability_flow
            )
            x = project(rmp, x, gray_image, vec_t)
            # denoised estimate with the clean gray channel
            zm = decouple(x_mean).at[..., :1].set(decouple(gray_image)[..., :1])
            x_mean = couple(zm)
            return (x, x_mean, rng), (x if show_evolution else None)

        (x, x_mean, _), evo = jax.lax.scan(body, (x, x, rng), timesteps)
        samples = x_mean if denoise else x
        info = {"evolution": evo} if show_evolution else {}
        return samples, info

    return colorizer
