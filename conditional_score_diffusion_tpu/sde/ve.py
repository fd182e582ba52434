"""Variance-exploding (SMLD) SDE.

Reference: `sde_lib.py:290-419` (VESDE/cVESDE), including the optional
``data_mean`` prior shift (`sde_lib.py:341-347`) and the backward kernel
``p(x_t | x_0, x_{t+tau})`` used by the path-wise conditional sampler
(`sde_lib.py:323-339`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .base import ReverseSDE, batch_mul


@struct.dataclass
class VESDE:
    """dx = sigma(t) * sqrt(2 log(sigma_max/sigma_min)) dW, sigma geometric.

    ``sigma_min``/``sigma_max`` are pytree leaves so they may be traced
    (the VS-CMDE schedule anneals sigma_max_y inside the jitted train step).
    ``N`` is a static discretization count.
    """

    sigma_min: jnp.ndarray = struct.field(default=0.01)
    sigma_max: jnp.ndarray = struct.field(default=50.0)
    data_mean: Optional[jnp.ndarray] = struct.field(default=None)
    N: int = struct.field(pytree_node=False, default=1000)

    @property
    def T(self) -> float:
        return 1.0

    def _sigma(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    @property
    def discrete_sigmas(self) -> jnp.ndarray:
        """Geometric sigma ladder, ascending (reference `sde_lib.py:301`)."""
        log_min = jnp.log(self.sigma_min)
        log_max = jnp.log(self.sigma_max)
        return jnp.exp(jnp.linspace(log_min, log_max, self.N))

    def sde(self, x, t):
        sigma = self._sigma(t)
        drift = jnp.zeros_like(x)
        diffusion = sigma * jnp.sqrt(2.0 * (jnp.log(self.sigma_max) - jnp.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        """Perturbation-kernel parameters of p(x_t | x_0): (mean, std)."""
        return x, self._sigma(t)

    def compute_backward_kernel(self, x0, x_tplustau, t, tau):
        """Parameters of p(x_t | x_0, x_{t+tau}) (reference `sde_lib.py:323-339`)."""
        s_t2 = self._sigma(t) ** 2
        s_tt2 = self._sigma(t + tau) ** 2
        std = jnp.sqrt(s_t2 * (s_tt2 - s_t2) / s_tt2)
        w0 = (s_tt2 - s_t2) / s_tt2
        w1 = s_t2 / s_tt2
        mean = batch_mul(w0, x0) + batch_mul(w1, x_tplustau)
        return mean, std

    def prior_sampling(self, rng, shape):
        z = jax.random.normal(rng, shape) * self.sigma_max
        if self.data_mean is not None:
            z = z + jnp.broadcast_to(self.data_mean, shape)
        return z

    def prior_logp(self, z):
        dims = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return (
            -dims / 2.0 * jnp.log(2 * jnp.pi * self.sigma_max**2)
            - jnp.sum(z**2, axis=axes) / (2 * self.sigma_max**2)
        )

    def discretize(self, x, t):
        """SMLD (NCSN) discretization (reference `sde_lib.py:354-362`)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigmas = self.discrete_sigmas
        sigma = sigmas[timestep]
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(sigma), sigmas[jnp.maximum(timestep - 1, 0)])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent**2)
        return f, G

    def reverse(self, score_fn, probability_flow: bool = False) -> ReverseSDE:
        return ReverseSDE(self, score_fn, probability_flow)
