"""Unit tests for the SDE core against closed forms.

Mirrors the reference semantics in `sde_lib.py` (VE `:290-419`, VP `:144-248`,
subVP `:251-287`, reverse `:65-142`, backward kernel `:323-339`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_score_diffusion_tpu.sde import (
    VESDE,
    VPSDE,
    ReverseSDE,
    batch_mul,
    build_sde,
    subVPSDE,
)


def test_batch_mul_broadcasts_like_reference():
    a = jnp.array([1.0, 2.0, 3.0])
    x = jnp.ones((3, 4, 5, 2))
    out = batch_mul(a, x)
    assert out.shape == x.shape
    np.testing.assert_allclose(out[1], 2.0 * np.ones((4, 5, 2)))


class TestVESDE:
    def test_marginal_prob_geometric(self):
        sde = VESDE(sigma_min=0.01, sigma_max=50.0, N=1000)
        x = jnp.ones((2, 3))
        t = jnp.array([0.0, 1.0])
        mean, std = sde.marginal_prob(x, t)
        np.testing.assert_allclose(mean, x)
        np.testing.assert_allclose(std, [0.01, 50.0], rtol=1e-6)

    def test_sde_diffusion_matches_dstd_dt(self):
        # g(t)^2 must equal d/dt sigma(t)^2 for the VE forward process.
        sde = VESDE(sigma_min=0.01, sigma_max=50.0)
        t = jnp.array(0.3)
        _, g = sde.sde(jnp.zeros((1, 4)), t[None])
        eps = 1e-4
        s2 = lambda tt: float(sde.marginal_prob(jnp.zeros(()), tt)[1] ** 2)
        dsigma2 = (s2(t + eps) - s2(t - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g[0] ** 2), dsigma2, rtol=1e-3)

    def test_discretize_matches_sigma_ladder(self):
        sde = VESDE(sigma_min=0.01, sigma_max=50.0, N=10)
        sigmas = np.exp(np.linspace(np.log(0.01), np.log(50.0), 10))
        x = jnp.zeros((2, 3))
        t = jnp.array([1.0, 0.0])  # timesteps 9 and 0
        _, G = sde.discretize(x, t)
        np.testing.assert_allclose(
            G, [np.sqrt(sigmas[9] ** 2 - sigmas[8] ** 2), sigmas[0]], rtol=1e-5
        )

    def test_backward_kernel_is_consistent_posterior(self):
        # p(x_t | x_0, x_{t+tau}) must be the Gaussian posterior of the
        # forward chain: check mean weights sum to 1 at x0 = x_{t+tau},
        # and that var(t->0) -> 0.
        sde = VESDE(sigma_min=0.01, sigma_max=50.0)
        x0 = jnp.ones((2, 3))
        xt = jnp.ones((2, 3)) * 4.0
        t = jnp.array([0.5, 0.5])
        tau = jnp.array([0.01, 0.01])
        mean, std = sde.compute_backward_kernel(x0, xt, t, tau)
        s_t2 = float(sde.marginal_prob(jnp.zeros(()), t[0])[1] ** 2)
        s_tt2 = float(sde.marginal_prob(jnp.zeros(()), t[0] + tau[0])[1] ** 2)
        expected_mean = 1.0 * (s_tt2 - s_t2) / s_tt2 + 4.0 * s_t2 / s_tt2
        np.testing.assert_allclose(mean[0, 0], expected_mean, rtol=1e-5)
        np.testing.assert_allclose(
            float(std[0]), np.sqrt(s_t2 * (s_tt2 - s_t2) / s_tt2), rtol=1e-5
        )

    def test_prior_sampling_statistics_and_data_mean(self):
        sde = VESDE(sigma_min=0.01, sigma_max=5.0, data_mean=jnp.full((3,), 7.0))
        z = sde.prior_sampling(jax.random.key(0), (4096, 3))
        np.testing.assert_allclose(float(z.mean()), 7.0, atol=0.3)
        np.testing.assert_allclose(float(z.std()), 5.0, rtol=0.05)

    def test_prior_logp_matches_gaussian(self):
        sde = VESDE(sigma_max=2.0)
        z = jnp.zeros((1, 2, 2, 1))
        expected = -4 / 2 * np.log(2 * np.pi * 4.0)
        np.testing.assert_allclose(sde.prior_logp(z)[0], expected, rtol=1e-6)

    def test_traced_sigma_max_jits(self):
        # sigma_max must be traceable (VS-CMDE anneals it inside jit).
        @jax.jit
        def std_at(smax, t):
            sde = VESDE(sigma_min=0.01, sigma_max=smax)
            return sde.marginal_prob(jnp.zeros(()), t)[1]

        np.testing.assert_allclose(float(std_at(3.0, jnp.array(1.0))), 3.0, rtol=1e-6)
        np.testing.assert_allclose(float(std_at(9.0, jnp.array(1.0))), 9.0, rtol=1e-6)


class TestVPSDE:
    def test_marginal_prob(self):
        sde = VPSDE(beta_0=0.1, beta_1=20.0)
        x = jnp.ones((1, 2))
        t = jnp.array([1.0])
        mean, std = sde.marginal_prob(x, t)
        lmc = -0.25 * (20.0 - 0.1) - 0.5 * 0.1
        np.testing.assert_allclose(mean[0, 0], np.exp(lmc), rtol=1e-6)
        np.testing.assert_allclose(std[0], np.sqrt(1 - np.exp(2 * lmc)), rtol=1e-6)

    def test_variance_preservation(self):
        # mean^2 + std^2 == 1 for unit data.
        sde = VPSDE()
        t = jnp.array([0.2, 0.5, 0.9])
        mean, std = sde.marginal_prob(jnp.ones((3,)), t)
        np.testing.assert_allclose(mean**2 + std**2, 1.0, rtol=1e-6)

    def test_discretize_ddpm(self):
        sde = VPSDE(N=100)
        t = jnp.array([0.5])
        x = jnp.ones((1, 3))
        f, G = sde.discretize(x, t)
        betas = np.linspace(0.1 / 100, 20.0 / 100, 100)
        k = int(0.5 * 99)
        np.testing.assert_allclose(f[0, 0], np.sqrt(1 - betas[k]) - 1.0, rtol=1e-5)
        np.testing.assert_allclose(G[0], np.sqrt(betas[k]), rtol=1e-5)


class TestSubVPSDE:
    def test_std_is_one_minus_exp(self):
        sde = subVPSDE()
        t = jnp.array([0.7])
        _, std = sde.marginal_prob(jnp.zeros((1,)), t)
        lmc = -0.25 * 0.7**2 * (20.0 - 0.1) - 0.5 * 0.7 * 0.1
        np.testing.assert_allclose(std[0], 1.0 - np.exp(2 * lmc), rtol=1e-6)


class TestReverse:
    def test_reverse_drift_unconditional(self):
        sde = VESDE(sigma_min=0.1, sigma_max=10.0)
        score = lambda x, t: -x  # fake score
        rsde = sde.reverse(score)
        x = jnp.ones((2, 3))
        t = jnp.full((2,), 0.5)
        drift, diffusion = rsde.sde(x, t)
        fwd_drift, g = sde.sde(x, t)
        np.testing.assert_allclose(drift, fwd_drift - batch_mul(g**2, -x), rtol=1e-6)

    def test_probability_flow_halves_score_and_zeroes_diffusion(self):
        sde = VESDE(sigma_min=0.1, sigma_max=10.0)
        score = lambda x, t: -x
        rsde = sde.reverse(score, probability_flow=True)
        x = jnp.ones((2, 3))
        t = jnp.full((2,), 0.5)
        drift, diffusion = rsde.sde(x, t)
        _, g = sde.sde(x, t)
        np.testing.assert_allclose(drift, -batch_mul(g**2, -x) * 0.5, rtol=1e-6)
        np.testing.assert_allclose(diffusion, 0.0)

    def test_conditional_reverse_passes_y(self):
        sde = VESDE()
        seen = {}

        def score(x, y, t):
            seen["y"] = y
            return -x

        rsde = sde.reverse(score)
        x = jnp.ones((2, 3))
        y = jnp.full((2, 3), 5.0)
        t = jnp.full((2,), 0.5)
        rsde.discretize(x, t, y)
        np.testing.assert_allclose(seen["y"], y)


class TestFactory:
    def _config(self, approach=None):
        import ml_collections

        c = ml_collections.ConfigDict()
        c.training = ml_collections.ConfigDict()
        c.training.sde = "vesde"
        if approach:
            c.training.conditioning_approach = approach
        c.model = ml_collections.ConfigDict()
        c.model.num_scales = 100
        c.model.sigma_min = 0.01
        c.model.sigma_max = 50.0
        c.model.sigma_min_x = 5e-3
        c.model.sigma_max_x = 100.0
        c.model.sigma_min_y = 5e-3
        c.model.sigma_max_y = 0.5
        c.model.beta_min = 0.1
        c.model.beta_max = 20.0
        return c

    def test_unconditional(self):
        sde, eps = build_sde(self._config())
        assert isinstance(sde, VESDE) and eps == 1e-5
        assert sde.sigma_max == 50.0

    def test_sr3_single_sde(self):
        sde, _ = build_sde(self._config("sr3"))
        assert isinstance(sde, VESDE)
        assert sde.sigma_max == 100.0

    def test_multispeed_dict(self):
        sde, _ = build_sde(self._config("ours_NDV"))
        assert isinstance(sde, dict)
        assert sde["x"].sigma_max == 100.0 and sde["y"].sigma_max == 0.5

    def test_multispeed_is_a_pytree(self):
        sde, _ = build_sde(self._config("ours_NDV"))
        leaves = jax.tree_util.tree_leaves(sde)
        assert len(leaves) == 4  # two (sigma_min, sigma_max) pairs

    def test_sigma_y_override(self):
        sde, _ = build_sde(self._config("ours_DV"), sigma_max_y=3.3)
        assert float(sde["y"].sigma_max) == pytest.approx(3.3)
