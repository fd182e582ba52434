"""Exact single-step predictor/corrector parity against the reference.

Every predictor's (and ald's) ``x_mean`` branch is deterministic given the
score, so it can be compared EXACTLY against the reference torch classes
(`sampling/predictors.py`, `sampling/correctors.py`) with a shared analytic
score — no distributional slack.  (The langevin correctors' step size
depends on the drawn noise norm, so they are covered distributionally by
`test_sampler_parity` instead.)
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_reference_parity import _stub_modules

from conditional_score_diffusion_tpu.sampling import get_corrector, get_predictor
from conditional_score_diffusion_tpu.sde import VESDE, batch_mul

N = 50
SMIN, SMAX = 0.05, 8.0


def _import(mod):
    _stub_modules()
    sys.path.insert(0, REF)
    try:
        return __import__(mod, fromlist=["*"])
    finally:
        sys.path.pop(0)


def _score_np(x, t, sigma_min=SMIN, sigma_max=SMAX):
    """Analytic score of N(0, 1 + sigma(t)^2) per coordinate (numpy math,
    shared by both frameworks)."""
    sigma = sigma_min * (sigma_max / sigma_min) ** t
    return -x / (1.0 + sigma[:, None] ** 2)


def _torch_score(x, t):
    return torch.from_numpy(_score_np(x.numpy(), t.numpy()))


def _torch_cond_score(x, y, t):
    return torch.from_numpy(_score_np(x.numpy(), t.numpy()) + 0.5 * y.numpy())


def _jax_score(x, t):
    sigma = SMIN * (SMAX / SMIN) ** t
    return -batch_mul(1.0 / (1.0 + sigma**2), x)


def _jax_cond_score(x, y, t):
    return _jax_score(x, t) + 0.5 * y


@pytest.fixture(scope="module")
def ref_mods():
    return _import("sampling.predictors"), _import("sampling.correctors"), _import("sde_lib")


def _inputs():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 6).astype(np.float32)
    t = np.array([0.9, 0.5, 0.2, 0.04], np.float32)
    return x, t


@pytest.mark.parametrize("name", ["euler_maruyama", "reverse_diffusion",
                                  "ancestral_sampling", "none"])
def test_unconditional_predictor_x_mean_exact(ref_mods, name):
    ref_pred, _, ref_sde_lib = ref_mods
    x, t = _inputs()
    r_sde = ref_sde_lib.VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    rp = ref_pred.get_predictor(name)(r_sde, _torch_score, probability_flow=False)
    with torch.no_grad():
        _, want = rp.update_fn(torch.from_numpy(x), torch.from_numpy(t))

    o_sde = VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    fn = get_predictor(name)
    _, got = fn(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                sde=o_sde, score_fn=_jax_score)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


@pytest.mark.parametrize("name", ["conditional_euler_maruyama",
                                  "conditional_reverse_diffusion", "conditional_none"])
def test_conditional_predictor_x_mean_exact(ref_mods, name):
    ref_pred, _, ref_sde_lib = ref_mods
    x, t = _inputs()
    y = np.random.RandomState(1).randn(4, 6).astype(np.float32)
    r_sde = ref_sde_lib.cVESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    rp = ref_pred.get_predictor(name)(r_sde, _torch_cond_score, probability_flow=False)
    with torch.no_grad():
        _, want = rp.update_fn(torch.from_numpy(x), torch.from_numpy(y),
                               torch.from_numpy(t))

    o_sde = VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    fn = get_predictor(name)
    _, got = fn(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                sde=o_sde, score_fn=_jax_cond_score, y=jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_conditional_ancestral_x_mean_exact(ref_mods):
    """The reference's conditional_ancestral_sampling has a broken
    ``update_fn(self, x, t)`` signature (`predictors.py:176-180`, called as
    (x, y, t) by the shared wrapper); its inner vesde_update_fn is the
    intended math — compare against that."""
    ref_pred, _, ref_sde_lib = ref_mods
    x, t = _inputs()
    y = np.random.RandomState(1).randn(4, 6).astype(np.float32)
    r_sde = ref_sde_lib.cVESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    rp = ref_pred.get_predictor("conditional_ancestral_sampling")(
        r_sde, _torch_cond_score, probability_flow=False
    )
    with torch.no_grad():
        _, want = rp.vesde_update_fn(torch.from_numpy(x), torch.from_numpy(y),
                                     torch.from_numpy(t))

    o_sde = VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    fn = get_predictor("conditional_ancestral_sampling")
    _, got = fn(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                sde=o_sde, score_fn=_jax_cond_score, y=jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_ald_corrector_x_mean_exact(ref_mods):
    _, ref_corr, ref_sde_lib = ref_mods
    x, t = _inputs()
    r_sde = ref_sde_lib.VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    rc = ref_corr.get_corrector("ald")(r_sde, _torch_score, snr=0.2, n_steps=1)
    with torch.no_grad():
        _, want = rc.update_fn(torch.from_numpy(x), torch.from_numpy(t))

    o_sde = VESDE(sigma_min=SMIN, sigma_max=SMAX, N=N)
    fn = get_corrector("ald")
    _, got = fn(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                sde=o_sde, score_fn=_jax_score, snr=0.2, n_steps=1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
