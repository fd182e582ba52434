"""Variance-preserving (DDPM) and sub-VP SDEs.

Reference: `sde_lib.py:144-287` (VPSDE/cVPSDE, subVPSDE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .base import ReverseSDE, batch_mul


@struct.dataclass
class VPSDE:
    """dx = -1/2 beta(t) x dt + sqrt(beta(t)) dW, beta linear in t."""

    beta_0: jnp.ndarray = struct.field(default=0.1)
    beta_1: jnp.ndarray = struct.field(default=20.0)
    N: int = struct.field(pytree_node=False, default=1000)

    @property
    def T(self) -> float:
        return 1.0

    @property
    def discrete_betas(self) -> jnp.ndarray:
        return jnp.linspace(self.beta_0 / self.N, self.beta_1 / self.N, self.N)

    @property
    def alphas(self) -> jnp.ndarray:
        return 1.0 - self.discrete_betas

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.cumprod(self.alphas, axis=0)

    @property
    def sqrt_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(self.alphas_cumprod)

    @property
    def sqrt_1m_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alphas_cumprod)

    def _beta(self, t):
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def sde(self, x, t):
        beta_t = self._beta(t)
        drift = batch_mul(-0.5 * beta_t, x)
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def _log_mean_coeff(self, t):
        return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def marginal_prob(self, x, t):
        lmc = self._log_mean_coeff(t)
        mean = batch_mul(jnp.exp(lmc), x)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape)

    def prior_logp(self, z):
        dims = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -dims / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(z**2, axis=axes) / 2.0

    def discretize(self, x, t):
        """DDPM discretization (reference `sde_lib.py:187-195`)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = self.discrete_betas[timestep]
        alpha = self.alphas[timestep]
        f = batch_mul(jnp.sqrt(alpha), x) - x
        G = jnp.sqrt(beta)
        return f, G

    def reverse(self, score_fn, probability_flow: bool = False) -> ReverseSDE:
        return ReverseSDE(self, score_fn, probability_flow)


@struct.dataclass
class subVPSDE:
    """Sub-variance-preserving SDE for likelihood (reference `sde_lib.py:251-287`)."""

    beta_0: jnp.ndarray = struct.field(default=0.1)
    beta_1: jnp.ndarray = struct.field(default=20.0)
    N: int = struct.field(pytree_node=False, default=1000)

    @property
    def T(self) -> float:
        return 1.0

    def _beta(self, t):
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def sde(self, x, t):
        beta_t = self._beta(t)
        drift = batch_mul(-0.5 * beta_t, x)
        discount = 1.0 - jnp.exp(-2.0 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        lmc = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = batch_mul(jnp.exp(lmc), x)
        # Note: std is 1 - exp(2*lmc) (not its sqrt) — the sub-VP marginal
        # std really is 1 - exp(...) (reference `sde_lib.py:275-279`).
        std = 1.0 - jnp.exp(2.0 * lmc)
        return mean, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape)

    def prior_logp(self, z):
        dims = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -dims / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(z**2, axis=axes) / 2.0

    def discretize(self, x, t):
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        f = drift * dt
        G = diffusion * jnp.sqrt(dt)
        return f, G

    def reverse(self, score_fn, probability_flow: bool = False) -> ReverseSDE:
        return ReverseSDE(self, score_fn, probability_flow)
