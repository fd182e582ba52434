"""End-to-end sampling parity: the reference's torch PC sampler vs this
framework's scan sampler, with IDENTICAL model weights.

RNG streams differ across frameworks, so the comparison is distributional:
for a tiny DDPM scoring a low-dimensional image space, the two samplers'
output statistics (per-pixel mean field, global std, pairwise channel
correlations) must agree.  This is the FID-parity precursor that can run
without trained checkpoints.
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
import ml_collections

from test_reference_parity import _stub_modules


def _import_reference(mod):
    _stub_modules()
    sys.path.insert(0, REF)
    try:
        module = __import__(mod, fromlist=["*"])
        return module
    finally:
        sys.path.pop(0)


def _tiny_config():
    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(dict(continuous=True, sde="vesde"))
    c.sampling = ml_collections.ConfigDict(
        dict(method="pc", predictor="reverse_diffusion", corrector="langevin",
             n_steps_each=1, noise_removal=True, probability_flow=False, snr=0.16)
    )
    c.data = ml_collections.ConfigDict(
        dict(effective_image_size=8, centered=False, num_channels=3, shape=[3, 8, 8])
    )
    c.model = ml_collections.ConfigDict(
        dict(name="ddpm", nf=32, ch_mult=(1, 2), num_res_blocks=1,
             attn_resolutions=(4,), dropout=0.0, resamp_with_conv=True,
             conditional=True, nonlinearity="swish", num_scales=100,
             sigma_min=0.05, sigma_max=5.0,
             input_channels=3, output_channels=3)
    )
    return c


def test_pc_sampler_distribution_parity():
    ref_ddpm = _import_reference("models.ddpm")
    ref_sde_lib = _import_reference("sde_lib")
    ref_unc = _import_reference("sampling.unconditional")
    ref_pred = _import_reference("sampling.predictors")
    ref_corr = _import_reference("sampling.correctors")

    c = _tiny_config()
    # Seed BEFORE model creation: the correlation threshold below depends on
    # the (random-init) weights, so unseeded weights made this test flaky.
    torch.manual_seed(0)
    tm = ref_ddpm.DDPM(c)
    tm.eval()
    tm.device = torch.device("cpu")
    # reference get_score_fn reads model.embedding_type for unconditional VE
    # (models/utils.py:251); the torch DDPM class doesn't define it
    tm.embedding_type = "positional" 

    # ---- reference sampling (torch) ----
    torch.manual_seed(0)
    r_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    B = 128
    ref_sampler = ref_unc.get_pc_sampler(
        sde=r_sde, shape=(B, 3, 8, 8),
        predictor=ref_pred.get_predictor("reverse_diffusion"),
        corrector=ref_corr.get_corrector("langevin"),
        snr=0.16, p_steps=100, c_steps=1, probability_flow=False,
        continuous=True, denoise=True, eps=1e-5,
    )
    with torch.no_grad():
        ref_samples, _ = ref_sampler(tm)
    ref_samples = ref_samples.numpy().transpose(0, 2, 3, 1)

    # ---- this framework (identical weights) ----
    from conditional_score_diffusion_tpu.models.ddpm import DDPM
    from conditional_score_diffusion_tpu.models.torch_port import (
        port_reference_ddpm_state_dict,
    )
    from conditional_score_diffusion_tpu.models.wrappers import get_score_fn
    from conditional_score_diffusion_tpu.sampling import get_pc_sampler
    from conditional_score_diffusion_tpu.sde import VESDE

    fm = DDPM.from_config(c)
    params = port_reference_ddpm_state_dict(tm.state_dict(), c)
    o_sde = VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    score_fn = get_score_fn(o_sde, fm, params, conditional=False, train=False, continuous=True)
    sampler = get_pc_sampler(
        o_sde, (B, 8, 8, 3), "reverse_diffusion", "langevin",
        snr=0.16, p_steps=100, c_steps=1, denoise=True, eps=1e-5,
    )
    our_samples, _ = sampler(jax.random.key(0), score_fn)
    our_samples = np.asarray(our_samples)

    # ---- distributional comparison ----
    # With an untrained (random-init) net the output distribution is still a
    # well-defined pushforward of the prior; both samplers must agree on it.
    r_mean, o_mean = ref_samples.mean(), our_samples.mean()
    r_std, o_std = ref_samples.std(), our_samples.std()
    # global stats within MC error for B=128 x 192 dims
    np.testing.assert_allclose(o_mean, r_mean, atol=4 * r_std / np.sqrt(128 * 192) * 10)
    np.testing.assert_allclose(o_std, r_std, rtol=0.1)
    # per-pixel mean fields correlate strongly (structure from the net)
    rm = ref_samples.mean(axis=0).ravel()
    om = our_samples.mean(axis=0).ravel()
    denom = np.linalg.norm(rm - rm.mean()) * np.linalg.norm(om - om.mean())
    if denom > 1e-8:
        corr = float(np.dot(rm - rm.mean(), om - om.mean()) / denom)
        assert corr > 0.8, f"mean-field correlation {corr}"


def test_pc_conditional_sampler_distribution_parity():
    """The flagship CMDE inference path: reference torch conditional PC
    sampler (`sampling/conditional.py:47-228`, fresh-perturbation mode) vs
    this framework's scan sampler, identical ddpm_paired weights, matching
    output distributions."""
    ref_ddpm = _import_reference("models.ddpm")
    ref_sde_lib = _import_reference("sde_lib")
    ref_cond = _import_reference("sampling.conditional")

    c = _tiny_config()
    c.model.name = "ddpm_paired"
    c.model.input_channels = 6
    c.model.output_channels = 6
    c.data.num_channels = 6
    torch.manual_seed(0)
    tm = ref_ddpm.DDPM_paired(c)
    tm.eval()
    tm.device = torch.device("cpu")

    B = 128
    r_sde = {
        "x": ref_sde_lib.cVESDE(sigma_min=0.05, sigma_max=5.0, N=100),
        "y": ref_sde_lib.VESDE(sigma_min=0.01, sigma_max=0.5, N=100),
    }
    torch.manual_seed(1)
    # one shared conditioning image, tiled: the per-pixel mean field over
    # the batch is then a tight estimator of the conditional distribution
    y_np = np.tile(
        np.random.RandomState(7).rand(1, 3, 8, 8).astype(np.float32), (B, 1, 1, 1)
    )
    ref_sampler = ref_cond.get_pc_conditional_sampler(
        sde=r_sde, shape=(B, 3, 8, 8),
        predictor=_import_reference("sampling.predictors").get_predictor(
            "conditional_reverse_diffusion"),
        corrector=_import_reference("sampling.correctors").get_corrector(
            "conditional_langevin"),
        snr=0.16, p_steps=100, c_steps=1, probability_flow=False,
        continuous=True, denoise=True, eps=1e-5,
    )
    with torch.no_grad():
        ref_samples, _ = ref_sampler(tm, torch.from_numpy(y_np))
    ref_samples = ref_samples.numpy().transpose(0, 2, 3, 1)

    from conditional_score_diffusion_tpu.models.ddpm import DDPMPaired
    from conditional_score_diffusion_tpu.models.torch_port import (
        port_reference_ddpm_paired,
    )
    from conditional_score_diffusion_tpu.models.wrappers import (
        get_conditional_score_fn,
        get_score_fn,
    )
    from conditional_score_diffusion_tpu.sampling import get_pc_conditional_sampler
    from conditional_score_diffusion_tpu.sde import VESDE

    fm = DDPMPaired.from_config(c)
    params = port_reference_ddpm_paired(tm.state_dict(), c)
    o_sde = {
        "x": VESDE(sigma_min=0.05, sigma_max=5.0, N=100),
        "y": VESDE(sigma_min=0.01, sigma_max=0.5, N=100),
    }
    dict_score_fn = get_score_fn(
        o_sde, fm, params, conditional=True, train=False, continuous=True
    )
    score_fn = get_conditional_score_fn(dict_score_fn)
    sampler = get_pc_conditional_sampler(
        o_sde, (B, 8, 8, 3), "conditional_reverse_diffusion",
        "conditional_langevin", snr=0.16, p_steps=100, c_steps=1,
        denoise=True, eps=1e-5,
    )
    our_samples, _ = sampler(
        jax.random.key(0), score_fn, jnp.asarray(y_np.transpose(0, 2, 3, 1))
    )
    our_samples = np.asarray(our_samples)

    r_mean, o_mean = ref_samples.mean(), our_samples.mean()
    r_std, o_std = ref_samples.std(), our_samples.std()
    np.testing.assert_allclose(o_mean, r_mean, atol=4 * r_std / np.sqrt(128 * 192) * 10)
    np.testing.assert_allclose(o_std, r_std, rtol=0.1)
    # conditioning structure must transfer: per-pixel conditional mean
    # fields (over 128 draws with the same y) correlate strongly
    rm = ref_samples.mean(axis=0).ravel()
    om = our_samples.mean(axis=0).ravel()
    denom = np.linalg.norm(rm - rm.mean()) * np.linalg.norm(om - om.mean())
    if denom > 1e-8:
        corr = float(np.dot(rm - rm.mean(), om - om.mean()) / denom)
        assert corr > 0.8, f"conditional mean-field correlation {corr}"


def test_ode_sampler_deterministic_parity():
    """Probability-flow ODE sampling is deterministic given the initial
    latent, so reference (scipy RK45) and this framework (on-device odeint)
    must agree per-sample from the SAME z and weights
    (reference `sampling/unconditional.py:93-158`)."""
    ref_ddpm = _import_reference("models.ddpm")
    ref_sde_lib = _import_reference("sde_lib")
    ref_unc = _import_reference("sampling.unconditional")

    c = _tiny_config()
    torch.manual_seed(0)
    tm = ref_ddpm.DDPM(c)
    tm.eval()
    tm.device = torch.device("cpu")
    tm.embedding_type = "positional"

    B = 4
    z = np.random.RandomState(3).randn(B, 3, 8, 8).astype(np.float32) * 5.0
    r_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    ref_sampler = ref_unc.get_ode_sampler(
        r_sde, (B, 3, 8, 8), denoise=False, rtol=1e-5, atol=1e-5, eps=1e-3
    )
    with torch.no_grad():
        want, nfe = ref_sampler(tm, z=torch.from_numpy(z))
    want = want.numpy().transpose(0, 2, 3, 1)

    from conditional_score_diffusion_tpu.models.ddpm import DDPM
    from conditional_score_diffusion_tpu.models.torch_port import (
        port_reference_ddpm_state_dict,
    )
    from conditional_score_diffusion_tpu.models.wrappers import get_score_fn
    from conditional_score_diffusion_tpu.sampling.ode import get_ode_sampler
    from conditional_score_diffusion_tpu.sde import VESDE

    fm = DDPM.from_config(c)
    params = port_reference_ddpm_state_dict(tm.state_dict(), c)
    o_sde = VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    score_fn = get_score_fn(
        o_sde, fm, params, conditional=False, train=False, continuous=True
    )
    sampler = get_ode_sampler(
        o_sde, (B, 8, 8, 3), denoise=False, rtol=1e-5, atol=1e-5, eps=1e-3
    )
    got, _ = sampler(jax.random.key(0), score_fn, z=jnp.asarray(z.transpose(0, 2, 3, 1)))
    got = np.asarray(got)

    # solvers differ (RK45 vs dopri5) -> small integration slack
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=0)
    assert np.abs(got - want).mean() < 3e-3


def test_likelihood_bpd_deterministic_parity():
    """bits/dim parity: with the SAME Hutchinson probe, weights and data,
    the reference's scipy-RK45 likelihood (`likelihood.py:26-113`) and this
    framework's on-device augmented ODE agree."""
    ref_ddpm = _import_reference("models.ddpm")
    ref_sde_lib = _import_reference("sde_lib")
    ref_lik = _import_reference("likelihood")

    c = _tiny_config()
    torch.manual_seed(0)
    tm = ref_ddpm.DDPM(c)
    tm.eval()
    tm.device = torch.device("cpu")
    tm.embedding_type = "positional"

    B = 2
    data = np.random.RandomState(5).rand(B, 3, 8, 8).astype(np.float32)
    eps_probe = (np.random.RandomState(6).randint(0, 2, data.shape) * 2 - 1).astype(
        np.float32
    )

    r_sde = ref_sde_lib.VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    ref_fn = ref_lik.get_likelihood_fn(
        r_sde, inverse_scaler=lambda x: x, hutchinson_type="Gaussian",
        rtol=1e-5, atol=1e-5, eps=1e-5,
    )
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **k: torch.from_numpy(eps_probe)
    try:
        want_bpd, want_z, _ = ref_fn(tm, torch.from_numpy(data))
    finally:
        torch.randn_like = orig_randn_like

    from conditional_score_diffusion_tpu.models.ddpm import DDPM
    from conditional_score_diffusion_tpu.models.torch_port import (
        port_reference_ddpm_state_dict,
    )
    from conditional_score_diffusion_tpu.models.wrappers import get_score_fn
    from conditional_score_diffusion_tpu.sampling.likelihood import get_likelihood_fn
    from conditional_score_diffusion_tpu.sde import VESDE

    fm = DDPM.from_config(c)
    params = port_reference_ddpm_state_dict(tm.state_dict(), c)
    o_sde = VESDE(sigma_min=0.05, sigma_max=5.0, N=100)
    score_fn = get_score_fn(
        o_sde, fm, params, conditional=False, train=False, continuous=True
    )
    lik_fn = get_likelihood_fn(o_sde, rtol=1e-5, atol=1e-5, eps=1e-5)
    got_bpd, got_z, _ = lik_fn(
        jax.random.key(0), score_fn,
        jnp.asarray(data.transpose(0, 2, 3, 1)),
        epsilon=jnp.asarray(eps_probe.transpose(0, 2, 3, 1)),
    )
    # reference offset for identity inverse_scaler: 7 - (-1) = 8 (matches)
    np.testing.assert_allclose(np.asarray(got_bpd), want_bpd.numpy(), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(got_z).transpose(0, 3, 1, 2), want_z.numpy(), atol=2e-2
    )
