"""Exact likelihood (bits/dim) via the probability-flow ODE.

Reference: `likelihood.py:26-113` (Hutchinson-Skilling divergence estimator
with Rademacher/Gaussian probes + scipy RK45).  Here the augmented ODE
(state, logdet) integrates on device with `jax.experimental.ode.odeint`, and
the divergence vJp is a single `jax.jvp` — no autograd graph bookkeeping.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.ode import odeint

def get_div_fn(drift_fn: Callable, hutchinson_type: str = "Rademacher") -> Callable:
    """Divergence estimator (reference `likelihood.py:26-42`)."""

    def div_fn(x, t, epsilon):
        _, jvp = jax.jvp(lambda xx: drift_fn(xx, t), (x,), (epsilon,))
        return jnp.sum(jvp * epsilon, axis=tuple(range(1, x.ndim)))

    return div_fn


def get_likelihood_fn(
    sde,
    hutchinson_type: str = "Rademacher",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    eps: float = 1e-5,
) -> Callable:
    """Returns ``likelihood_fn(rng, score_fn, data) -> (bpd, z, nfe)``.

    ``data`` is assumed in [0, 1] with dequantization handled upstream,
    mirroring the reference's offset correction (`likelihood.py:95-110`).
    """

    def likelihood_fn(rng, score_fn, data, epsilon=None):
        rsde = sde.reverse(score_fn, probability_flow=True)

        def drift_fn(x, t):
            vec_t = jnp.full((x.shape[0],), t)
            return rsde.sde(x, vec_t)[0]

        div_fn = get_div_fn(drift_fn, hutchinson_type)

        rng, eps_rng = jax.random.split(rng)
        if epsilon is not None:
            pass  # caller-fixed probe (deterministic parity / variance reduction)
        elif hutchinson_type.lower() == "rademacher":
            epsilon = (
                jax.random.randint(eps_rng, data.shape, 0, 2).astype(data.dtype) * 2 - 1
            )
        elif hutchinson_type.lower() == "gaussian":
            epsilon = jax.random.normal(eps_rng, data.shape)
        else:
            raise NotImplementedError(f"Hutchinson type {hutchinson_type} unknown.")

        def dynamics(state, s):
            x, _ = state
            # integrate t: eps -> T (clamped: odeint's step heuristic can
            # probe outside the domain when the drift is tiny)
            t = jnp.clip(eps + s, eps, sde.T)
            dx = drift_fn(x, t)
            dlogp = div_fn(x, t, epsilon)
            return dx, dlogp

        init = (data, jnp.zeros(data.shape[0]))
        ts = jnp.array([0.0, sde.T - eps])
        (xs, dlogps) = odeint(dynamics, init, ts, rtol=rtol, atol=atol)
        z, delta_logp = xs[-1], dlogps[-1]

        prior_logp = sde.prior_logp(z)
        # logp(x) = prior_logp(z) + int div  (forward integration sign)
        logp = prior_logp + delta_logp
        N = np.prod(data.shape[1:])
        bpd = -logp / np.log(2) / N
        # data in [0,1]: offset 8 bits (reference `likelihood.py:104-108`)
        bpd = bpd + 8.0
        return bpd, z, -1

    return likelihood_fn
